package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document classification for a curation pipeline — the
  * domain/language TAGGING step that feeds mixing and per-domain
  * selection. Where [[TextAnalysis.withLangId]] is a fixed stopword
  * heuristic, this is a TRAINED multinomial naive Bayes over the
  * corpus's own labels: per-class token counts with add-one smoothing,
  * class priors, argmin over integer-bit surprisals.
  *
  * Exactness contract (the repo's integer-bit idiom, as in [[Dsir]] /
  * [[LmScore]]): every per-token term is
  * `floor(log2(den / num)) = bits(num, den)` computed by one
  * bit-length subtraction and one exact shift-compare — no floating
  * log anywhere, so per-class totals are exact longs and the argmin
  * is cross-engine replayable bit-for-bit (ties break to the
  * alphabetically first class). The whole-bit floor trades resolution
  * for exactness: per-token likelihood ratios under 2x may round to
  * zero evidence, which separably-vocabularied classes never notice
  * (ClassifySpec's planted-signal test recovers labels perfectly)
  * but near-identical class distributions feel. NOTE the driver
  * corpus's lang labels are synthetic — the text carries no language
  * signal (exact-float NB ceiling measured at 43.8% vs a 38.6%
  * majority class) — so the shipped query pins the MECHANISM
  * bit-for-bit, not label recovery on that data.
  *
  * Feature space: the default key is the raw token; the HASHED form
  * (`featOf` = `pmod(md5Hash60(w), B)`, the [[Dsir]] move) folds the
  * vocabulary into B buckets, making the model BUCKET-bounded instead
  * of vocabulary-bounded — at 100 TB the raw vocabulary is unbounded
  * (every typo is a key) while B is a config constant, so the hashed
  * model always fits the serving broadcast. The trade is hash-collision
  * evidence mixing (two tokens sharing a bucket pool their counts),
  * which a bucket count comfortably above the useful vocabulary keeps
  * negligible — and the arithmetic stays the exact integer-bit chain,
  * replayed bucket-for-bucket by the oracle.
  *
  * Scale shape: one tokenize lease feeds the count tables and the
  * scoring pass; counts are map-side-combined hash aggregates; the
  * class table (|classes| rows) and smoothing totals broadcast; the
  * per-(doc, class) score is one groupBy over the exploded-token join
  * (|classes| x token-occurrence rows — a bounded small multiplier,
  * classes are a handful); the per-doc argmin is one min_by
  * aggregate. No windows, no driver round-trip, nothing pairwise. */
object Classify {

  /** Hashed-feature bucket count for `t_classify_nb_hashed` /
    * `w_classify_nb_hashed` — comfortably above the fixture
    * vocabulary (so collisions exist but stay rare) and bounded at
    * any corpus size. */
  val HashedFeatureBuckets = 4096

  /** The hashed feature key as a STRING column: the portable 60-bit
    * hash folded into [[HashedFeatureBuckets]] buckets, stringified so
    * the entire count/score machinery (string-keyed frames, the
    * broadcast model map) is shared verbatim with the raw-token form. */
  def hashedFeat(w: Column): Column =
    pmod(graft.functions.PortableHash.md5Hash60(w),
      lit(HashedFeatureBuckets.toLong)).cast("string")

  /** The DuckDB twin of [[hashedFeat]]. */
  private[graft] def duckdbHashedFeat(expr: String): String =
    s"CAST(${graft.functions.PortableHash.duckdbHash60(expr)} % $HashedFeatureBuckets AS VARCHAR)"

  /** floor(log2(d / n)) for 1 <= n <= d as an exact long: candidate
    * k0 = bitlen(d) - bitlen(n), corrected by one shift-compare. */
  private def bits(n: Column, d: Column): Column = {
    val k0 = length(bin(d)) - length(bin(n))
    when(call_function("shiftleft", n, k0) <= d, k0)
      .otherwise(k0 - 1).cast("long")
  }

  /** Per-document naive-Bayes class prediction. Output:
    * (doc_id, <labelName>, pred_<labelName>, bits_best) for every
    * document with at least one token — a zero-token document carries
    * no evidence and is not classified. `bits_best` is the winning
    * class's exact total surprisal (prior + per-occurrence token
    * bits); lower = more probable. `featOf` maps each token occurrence
    * to its feature key (identity = raw tokens; [[hashedFeat]] = the
    * bucket-bounded model). */
  def nbPredict(
      docs: DataFrame, docId: Column, text: Column, label: Column,
      labelName: String,
      featOf: Column => Column = identity): DataFrame = {
    import docs.sparkSession.implicits._
    // the FEATURE keys are materialized inside the lease
    // (transform(tokens, featOf)) so the per-occurrence feature map —
    // an md5 per token in the hashed form — computes once, not once
    // per downstream consumer (vocabulary, count table, scoring pass
    // each read `tok`). Value-identical: explode∘transform(featOf) ==
    // featOf∘explode, and the class/total table reads only the array
    // LENGTH, which featOf preserves. The identity (raw-token) form
    // skips the wrapper — transform is CodegenFallback and an identity
    // lambda would add an interpreted pass for nothing.
    val rawToks = TextAnalysis.tokens(text)
    val isIdentity = {
      import org.apache.spark.sql.graft.ColumnBridge.expression
      expression(featOf(col("__p"))).semanticEquals(expression(col("__p")))
    }
    val toksL = Checkpoints.lease("nb_toks",
      docs.select(docId.as("doc_id"), label.as("lab"),
        (if (isIdentity) rawToks
         else transform(rawToks, w => featOf(w))).as("toks")))
    val tok = toksL.select($"doc_id", $"lab", explode($"toks").as("w"))
    // class table: doc prior numerator + token-total denominators
    val cls = toksL.groupBy($"lab").agg(
      count(lit(1)).as("n_docs_s"),
      sum(size($"toks")).cast("long").as("n_toks_s"))
    // corpus totals + vocabulary size ride ONE broadcast row
    val tot = toksL.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tok.agg(count_distinct($"w").as("vocab")))
    val prior = cls.crossJoin(broadcast(tot))
      .withColumn("prior_bits", bits($"n_docs_s", $"n_docs"))
      .withColumn("dd", $"n_toks_s" + $"vocab")
      .select($"lab", $"prior_bits", $"dd")
    val counts = tok.groupBy($"w", $"lab").agg(count(lit(1)).as("cws"))
    // every token occurrence scored under EVERY class: unseen
    // (token, class) pairs smooth to cws = 0
    val perClass = tok.select($"doc_id", $"w")
      .join(broadcast(prior.select($"lab", $"dd")))
      .join(counts, Seq("w", "lab"), "left")
      .withColumn("b", bits(coalesce($"cws", lit(0L)) + 1L, $"dd"))
      .groupBy($"doc_id", $"lab")
      .agg(sum($"b").as("tok_bits"))
      .join(broadcast(prior.select($"lab", $"prior_bits")), Seq("lab"))
      .withColumn("total", $"tok_bits" + $"prior_bits")
    perClass.groupBy($"doc_id")
      .agg(
        min_by($"lab", struct($"total", $"lab")).as(s"pred_$labelName"),
        min($"total").as("bits_best"))
      .join(docs.select(docId.as("doc_id"), label.as(labelName)), Seq("doc_id"))
      .select($"doc_id", col(labelName), col(s"pred_$labelName"), $"bits_best")
  }

  /** Shared oracle CTE chain up to `nbr` (doc_id, lab, total, rk) —
    * the full NB replay: tokenize, class/count tables, vocabulary,
    * integer-bit scores, per-doc per-class totals, argmin rank.
    * Parameterized by the TRAINING corpus relation (the add/takedown
    * forms retrain on corpus ± batch — exactly what count-frame
    * surgery on the stored artifact must equal) and by the feature
    * key (`wExpr` over the unnested token `u`: raw, or the hashed
    * bucket). */
  private[graft] def nbCtesFor(
      corpusRel: String, wExpr: String = "u"): String = s"""t AS (
                SELECT doc_id, lang AS lab,
                       [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                FROM $corpusRel),
              tok AS (
                SELECT doc_id, lab, $wExpr AS w
                FROM (SELECT doc_id, lab, unnest(toks) AS u FROM t)),
              cls AS (
                SELECT lab, count(*) AS n_docs_s,
                       CAST(sum(len(toks)) AS BIGINT) AS n_toks_s
                FROM t GROUP BY lab),
              tot AS (
                SELECT (SELECT count(*) FROM t) AS n_docs,
                       (SELECT count(DISTINCT w) FROM tok) AS vocab),
              prior AS (
                SELECT lab,
                       CASE WHEN (n_docs_s << (length(bin(n_docs)) - length(bin(n_docs_s)))) <= n_docs
                            THEN length(bin(n_docs)) - length(bin(n_docs_s))
                            ELSE length(bin(n_docs)) - length(bin(n_docs_s)) - 1 END AS prior_bits,
                       CAST(n_toks_s + vocab AS BIGINT) AS dd
                FROM cls CROSS JOIN tot),
              cnt AS (SELECT w, lab, count(*) AS cws FROM tok GROUP BY w, lab),
              sc AS (
                SELECT tok.doc_id, p.lab,
                       CAST(coalesce(cnt.cws, 0) + 1 AS BIGINT) AS nn, p.dd
                FROM tok CROSS JOIN prior p
                LEFT JOIN cnt ON cnt.w = tok.w AND cnt.lab = p.lab),
              per AS (
                SELECT doc_id, lab,
                       CAST(sum(CASE WHEN (nn << (length(bin(dd)) - length(bin(nn)))) <= dd
                                     THEN length(bin(dd)) - length(bin(nn))
                                     ELSE length(bin(dd)) - length(bin(nn)) - 1 END) AS BIGINT) AS tok_bits
                FROM sc GROUP BY doc_id, lab),
              nbr AS (
                SELECT per.doc_id, per.lab,
                       per.tok_bits + prior.prior_bits AS total,
                       row_number() OVER (PARTITION BY per.doc_id
                         ORDER BY per.tok_bits + prior.prior_bits ASC, per.lab ASC) AS rk
                FROM per JOIN prior USING (lab))"""

  private[graft] lazy val nbCtes: String = nbCtesFor("documents")

  /** The SERVING split of the NB replay, prefixed: the model — class
    * table, vocabulary, priors, token counts — is trained on
    * `corpusRel` (doc_id, lab, text), but the docs SCORED are
    * `scoreRel` (doc_id, text), which need not be inside the training
    * corpus at all. Tokens the model never saw left-join to count 0
    * and smooth to nn = 1 while `dd` and the vocabulary stay frozen on
    * the training side — exactly what
    * [[graft.streaming.ClassifyServe.withOnlineNbPredict]] computes
    * against the broadcast artifact. Ends at `<p>nbr`
    * (doc_id, lab, total, rk) over `scoreRel`'s tokened docs;
    * zero-token docs carry no evidence and emit no row (the serve
    * contract). */
  private[graft] def nbCtesAgainst(
      p: String, corpusRel: String, scoreRel: String): String = {
    val toksExpr =
      """[x for x in string_split_regex(lower(text), '\s+') if x != '']"""
    s"""${p}t AS (
                SELECT doc_id, lab, $toksExpr AS toks FROM $corpusRel),
              ${p}tok AS (
                SELECT lab, u AS w
                FROM (SELECT lab, unnest(toks) AS u FROM ${p}t)),
              ${p}cls AS (
                SELECT lab, count(*) AS n_docs_s,
                       CAST(sum(len(toks)) AS BIGINT) AS n_toks_s
                FROM ${p}t GROUP BY lab),
              ${p}tot AS (
                SELECT (SELECT count(*) FROM ${p}t) AS n_docs,
                       (SELECT count(DISTINCT w) FROM ${p}tok) AS vocab),
              ${p}prior AS (
                SELECT lab,
                       CASE WHEN (n_docs_s << (length(bin(n_docs)) - length(bin(n_docs_s)))) <= n_docs
                            THEN length(bin(n_docs)) - length(bin(n_docs_s))
                            ELSE length(bin(n_docs)) - length(bin(n_docs_s)) - 1 END AS prior_bits,
                       CAST(n_toks_s + vocab AS BIGINT) AS dd
                FROM ${p}cls CROSS JOIN ${p}tot),
              ${p}cnt AS (SELECT w, lab, count(*) AS cws
                          FROM ${p}tok GROUP BY w, lab),
              ${p}st AS (
                SELECT doc_id, $toksExpr AS toks FROM $scoreRel),
              ${p}stok AS (
                SELECT doc_id, u AS w
                FROM (SELECT doc_id, unnest(toks) AS u FROM ${p}st)),
              ${p}sc AS (
                SELECT s.doc_id, p2.lab,
                       CAST(coalesce(c.cws, 0) + 1 AS BIGINT) AS nn, p2.dd
                FROM ${p}stok s CROSS JOIN ${p}prior p2
                LEFT JOIN ${p}cnt c ON c.w = s.w AND c.lab = p2.lab),
              ${p}per AS (
                SELECT doc_id, lab,
                       CAST(sum(CASE WHEN (nn << (length(bin(dd)) - length(bin(nn)))) <= dd
                                     THEN length(bin(dd)) - length(bin(nn))
                                     ELSE length(bin(dd)) - length(bin(nn)) - 1 END) AS BIGINT) AS tok_bits
                FROM ${p}sc GROUP BY doc_id, lab),
              ${p}nbr AS (
                SELECT per.doc_id, per.lab,
                       per.tok_bits + prior.prior_bits AS total,
                       row_number() OVER (PARTITION BY per.doc_id
                         ORDER BY per.tok_bits + prior.prior_bits ASC, per.lab ASC) AS rk
                FROM ${p}per per JOIN ${p}prior prior USING (lab))"""
  }

  val queries: Seq[QueryDef] = Seq(

    // Trained NB language classification (see nbPredict): the corpus's
    // own lang labels train the model, every tokened document gets its
    // argmin-surprisal class. The oracle replays counts, smoothing,
    // the integer-bit scores, and the argmin rank exactly.
    QueryDef(
      "t_classify_nb",
      (s, d) => {
        import s.implicits._
        nbPredict(table(s, d, "documents"), $"doc_id", $"text", $"lang", "lang")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $nbCtes
              SELECT r.doc_id, d.lang, r.lab AS pred_lang,
                     CAST(r.total AS BIGINT) AS bits_best
              FROM nbr r JOIN documents d USING (doc_id)
              WHERE r.rk = 1 ORDER BY r.doc_id""")),

    // HASHED-feature NB (see the object doc): same chain, token key
    // folded to pmod(md5Hash60(w), 4096) — the bucket-bounded model
    // that always fits the serving broadcast at 100 TB. The oracle is
    // the identical chain with the hash substituted, so bucket
    // assignment, collision pooling, smoothing over the BUCKET
    // vocabulary, and the argmin all replay bit-for-bit.
    QueryDef(
      "t_classify_nb_hashed",
      (s, d) => {
        import s.implicits._
        nbPredict(table(s, d, "documents"), $"doc_id", $"text", $"lang", "lang",
            featOf = hashedFeat)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${nbCtesFor("documents", duckdbHashedFeat("u"))}
              SELECT r.doc_id, d.lang, r.lab AS pred_lang,
                     CAST(r.total AS BIGINT) AS bits_best
              FROM nbr r JOIN documents d USING (doc_id)
              WHERE r.rk = 1 ORDER BY r.doc_id""")),

    // PREDICTED-domain mixture rebalancing — the classify → mix
    // composition (the real use of a domain tagger in a mixing
    // pipeline): t_mix_rebalance's uniform-token-budget machinery with
    // the source key replaced by the NB classifier's PREDICTED class.
    // Per predicted domain: token totals, the exact-integer accept
    // rate in ppm flattening every domain to the smallest predicted
    // domain's token budget, and the hash-decided kept doc/token
    // counts — the whole membership function, aggregated. Zero-token
    // documents carry no prediction (the NB contract) and no tokens,
    // so their exclusion is semantically free. Scale shape: the
    // classifier's shape plus two tiny domain-axis aggregates and one
    // broadcast rates join — nothing new shuffles. The oracle chains
    // the NB replay into the rebalance replay, pinning the composition
    // at the (doc, prediction) boundary.
    QueryDef(
      "t_mix_classified",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val pred = nbPredict(docs, $"doc_id", $"text", $"lang", "lang")
          .select($"doc_id", $"pred_lang")
        // tokenize once for the totals pass AND the keep join
        val t = Checkpoints.lease("mixc_t", docs
          .select($"doc_id",
            size(TextAnalysis.tokens($"text")).cast("long").as("nt"))
          .join(pred, Seq("doc_id")))
        val tot = t.groupBy($"pred_lang")
          .agg(count(lit(1)).as("n_total"), sum($"nt").as("ts"))
        val mn = tot.agg(min($"ts").as("mts"))
        val rates = tot.crossJoin(broadcast(mn))
          .withColumn("rate_ppm", expr("mts * 1000000L div ts"))
          .select($"pred_lang", $"rate_ppm")
        t.join(broadcast(rates), Seq("pred_lang"))
          .withColumn("__keep",
            graft.functions.PortableHash.md5Hash60($"doc_id".cast("string"))
              % 1000000L < $"rate_ppm")
          .groupBy($"pred_lang")
          .agg(
            count(lit(1)).as("n_total"),
            sum($"nt").as("tokens_total"),
            first($"rate_ppm").as("rate_ppm"),
            sum(when($"__keep", 1L).otherwise(0L)).as("n_kept"),
            sum(when($"__keep", $"nt").otherwise(0L)).as("tokens_kept"))
          .orderBy($"pred_lang")
      },
      Some(s"""WITH $nbCtes,
              mpred AS (SELECT doc_id, lab AS pred_lang FROM nbr WHERE rk = 1),
              mtt AS (
                SELECT d.doc_id, p.pred_lang,
                       CAST(len([x for x in string_split_regex(lower(d.text), '\\s+') if x != '']) AS BIGINT) AS nt
                FROM documents d JOIN mpred p USING (doc_id)),
              mtot AS (
                SELECT pred_lang, count(*) AS n_total, sum(nt) AS ts
                FROM mtt GROUP BY pred_lang),
              mmn AS (SELECT min(ts) AS mts FROM mtot),
              mr AS (
                SELECT pred_lang, (mts * 1000000) // ts AS rate_ppm
                FROM mtot CROSS JOIN mmn),
              mk AS (
                SELECT mtt.pred_lang, mtt.nt, mr.rate_ppm,
                       (('0x' || substring(md5(CAST(mtt.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)
                         < mr.rate_ppm AS keep
                FROM mtt JOIN mr USING (pred_lang))
              SELECT pred_lang,
                     count(*) AS n_total,
                     CAST(sum(nt) AS BIGINT) AS tokens_total,
                     CAST(min(rate_ppm) AS BIGINT) AS rate_ppm,
                     CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     CAST(sum(CASE WHEN keep THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept
              FROM mk GROUP BY pred_lang ORDER BY pred_lang"""))
  )
}
