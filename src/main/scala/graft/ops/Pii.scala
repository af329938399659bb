package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the standard pre-training masking
  * stage every public corpus pipeline runs (C4 strips boilerplate and
  * contact lines; Dolma and RefinedWeb mask emails / phone numbers /
  * IP addresses with typed placeholder tokens before anything reaches
  * a trainer). The reference has no such surface; this is
  * driver-brief extension work alongside the dedup/decontamination
  * family.
  *
  * Semantics: three typed detectors applied as a SEQUENTIAL redaction
  * pipeline — emails, then IPv4 addresses, then phone numbers — each
  * stage counting its matches on the text AS LEFT BY the previous
  * stage and replacing them with `<EMAIL>` / `<IP>` / `<PHONE>`.
  * Order matters and is part of the contract: an email local-part or
  * host may contain digit runs and embedded dotted quads
  * (`user@mail10.0.0.example.com`), so emails redact first and the
  * IP stage never sees their insides; dotted quads can embed
  * phone-shaped digit groups, so IPs redact before phones. (An
  * IP-LITERAL host, `admin@10.0.0.1`, is outside the email shape —
  * no alphabetic TLD — and redacts as an IP; spec-pinned.) Staging the counts the same
  * way keeps count and replacement consistent (`n_emails + n_ips +
  * n_phones` = total placeholder tokens in `redacted`).
  *
  * Regex portability: the patterns are pinned to the dialect subset
  * where `java.util.regex` (Spark's engine, leftmost-first) and RE2
  * (DuckDB's engine, also leftmost-first by default) provably agree —
  * character classes, bounded/unbounded repetition, `\b` ASCII word
  * boundaries, ordered alternation with longest-branch-first; no
  * lookaround, no backreferences (RE2 has neither). Both engines were
  * fixture-tested on positives and negatives before the patterns were
  * frozen; PiiSpec pins the JVM side, the `t_pii_redact` oracle
  * replays the identical pattern strings in DuckDB.
  *
  * Scale shape: pure per-row column algebra — the plan is scan →
  * project, ZERO exchanges (PlanSpec gates it). Each regex literal is
  * compiled once per RegExpReplace/RegExpCount instance and reused
  * across rows; the six regex passes ride whole-stage codegen. At
  * 100 TB this operator is scan-bound, exactly like the quality /
  * repetition filters it composes with.
  */
object Pii {

  /** RFC-ish email: dotted/tagged local part, dotted host, >=2-letter
    * TLD. Deliberately naive-but-standard (the C4/Dolma masks are the
    * same shape): no quoted local parts, no IP-literal hosts. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like `1.2.3`
    * never match but `1.2.3.4` does. Octet range deliberately
    * unchecked (`999.999.999.999` redacts) — over-masking a non-IP is
    * the safe failure mode for a privacy filter. */
  val IpRe: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone: optional `+CC ` prefix, `(NXX) ` or `NXX-`/
    * `NXX.` area code, then 3[-.]4. Separators are REQUIRED — a bare
    * 10-digit run is more often an id than a phone, and the word
    * salad of a corpus must not be eaten by an over-eager digit
    * matcher. */
  val PhoneRe: String = "(\\+\\d{1,2} )?(\\(\\d{3}\\) ?|\\d{3}[-.])\\d{3}[-.]\\d{4}"

  /** Typed placeholder a detector rewrites its matches to. */
  def token(kind: String): String = s"<$kind>"

  /** One row per document: per-type match counts, the total, and the
    * fully redacted text. `id` is returned as `doc_id`. */
  def redactPii(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // withColumn staging, not one giant select: each regex output is
    // referenced twice (count + next stage input), and CollapseProject
    // will not inline a non-cheap expression used more than once — so
    // every regex pass runs exactly once per row, all in one
    // whole-stage-codegen'd projection chain.
    docs.select(id.as("doc_id"), text.as("__t0"))
      .withColumn("n_emails", regexp_count(col("__t0"), lit(EmailRe)).cast("long"))
      .withColumn("__t1", regexp_replace(col("__t0"), EmailRe, token("EMAIL")))
      .withColumn("n_ips", regexp_count(col("__t1"), lit(IpRe)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), IpRe, token("IP")))
      .withColumn("n_phones", regexp_count(col("__t2"), lit(PhoneRe)).cast("long"))
      .withColumn("redacted", regexp_replace(col("__t2"), PhoneRe, token("PHONE")))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("n_pii"),
        col("redacted"))
  }

  /** The driver's `documents` fixture is PII-free word salad, so the
    * correctness query plants PII deterministically from `doc_id`
    * before redacting: docs cycle through appended email / parenthes-
    * ized phone / dotted-quad IP / phone+email / nothing suffixes.
    * Both engines build the identical augmented text (integer modulo
    * + lpad + concat, replayed verbatim in the oracle), so the hash
    * compare exercises every detector on real positives AND the
    * untouched-suffix negative case — not just zero counts. */
  private[ops] def plantedPiiText(id: Column, text: Column): Column = {
    val m = pmod(id, lit(5))
    concat(text,
      when(m === 0, concat(
        lit(" reach me at user"), id.cast("string"),
        lit("@ex"), pmod(id, lit(7)).cast("string"),
        lit(".example.com ok")))
      .when(m === 1, concat(
        lit(" call +1 (202) 555-"),
        lpad(pmod(id, lit(10000)).cast("string"), 4, "0"),
        lit(" today")))
      .when(m === 2, concat(
        lit(" server at 10."), pmod(id, lit(256)).cast("string"),
        lit("."), pmod(id * 7, lit(256)).cast("string"),
        lit("."), (pmod(id, lit(250)) + 1).cast("string"),
        lit(" up")))
      .when(m === 3, concat(
        lit(" dial 303-555."),
        lpad(pmod(id, lit(10000)).cast("string"), 4, "0"),
        lit(" and mail a.b+tag@x.co")))
      .otherwise(lit("")))
  }

  /** The oracle's copy of [[plantedPiiText]], over `documents`. */
  private def plantedSql: String =
    """SELECT doc_id, text ||
         CASE doc_id % 5
           WHEN 0 THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example.com ok'
           WHEN 1 THEN ' call +1 (202) 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' today'
           WHEN 2 THEN ' server at 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                       || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)
                       || ' up'
           WHEN 3 THEN ' dial 303-555.'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' and mail a.b+tag@x.co'
           ELSE '' END AS t0
       FROM documents"""

  val queries: Seq[QueryDef] = Seq(

    // PII detection + redaction over the planted corpus. The oracle
    // replays the identical regex strings (RE2 side of the pinned
    // portable dialect) through the identical email -> IP -> phone
    // staging, so pattern semantics, staging order, and replacement
    // all sit inside the hash compare.
    QueryDef(
      "t_pii_redact",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        redactPii(
          docs.select($"doc_id", plantedPiiText($"doc_id", $"text").as("text")),
          $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""WITH aug AS ($plantedSql),
              s1 AS (SELECT doc_id,
                       CAST(len(regexp_extract_all(t0, '$EmailRe')) AS BIGINT) AS n_emails,
                       regexp_replace(t0, '$EmailRe', '<EMAIL>', 'g') AS t1
                     FROM aug),
              s2 AS (SELECT doc_id, n_emails,
                       CAST(len(regexp_extract_all(t1, '$IpRe')) AS BIGINT) AS n_ips,
                       regexp_replace(t1, '$IpRe', '<IP>', 'g') AS t2
                     FROM s1),
              s3 AS (SELECT doc_id, n_emails, n_ips,
                       CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones,
                       regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g') AS redacted
                     FROM s2)
              SELECT doc_id, n_emails, n_ips, n_phones,
                     n_emails + n_ips + n_phones AS n_pii, redacted
              FROM s3 ORDER BY doc_id"""))
  )
}
