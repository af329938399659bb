package graft.ops

import graft.QueryDef
import graft.functions.Bpe
import graft.model.Tables.table
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Subword (BPE) tokenization queries: real token budgets for the
  * chunk / pack pipeline steps instead of whitespace-word counts.
  *
  * The tokenizer itself is [[graft.functions.Bpe]] — a fused
  * expression applying the committed 768-merge table
  * (`src/main/resources/graft/bpe_merges.txt`, trained offline by
  * `tools/train_bpe.py` with the classic Sennrich et al. 2016
  * algorithm: 64 organic merges over the sf0.001 corpus plus a
  * 704-merge synthetic-hex extension — the corpus vocabulary
  * saturates at 109 organic merges, so fixture scale has to come from
  * an auxiliary vocabulary; see the trainer's docstring).
  *
  * The correctness oracle replays BPE application IN FULL inside
  * DuckDB: one recursive CTE applies merge k (from a generated VALUES
  * table) at recursion depth k as a `list_reduce` left fold merging
  * adjacent (a, b) symbol pairs — see [[bpeCtesFrom]] for why the
  * recursive form replaced the per-merge chained CTEs at this fixture
  * size. The fold form is equivalent to the trainer's left-to-right
  * scan — a freshly merged symbol `ab` can never start another (a, b)
  * occurrence because `ab != a` — and BpeSpec asserts scan == fold on
  * the corpus, so the cross-engine hash-compare covers the
  * tokenizer's exact output, not just row counts.
  *
  * Scale shape: all three queries are per-row compute (the tokenizer
  * rides whole-stage codegen, word results memoized per thread) with
  * the same shuffle shapes as their whitespace twins — t_tokenize is
  * shuffle-free, t_chunk_bpe is pure fan-out, t_pack_bpe is the
  * bucketed two-phase prefix sum. A 100 TB corpus tokenizes in one
  * scan-bound map pass.
  */
object Tokenize {

  /** BPE token stream of a text column (array<string>). */
  def bpeTokens(text: Column): Column = Bpe.bpeTokens(text)

  /** Exact BPE token count of a text column. */
  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("long")

  private def esc(s: String) = s.replace("'", "''")

  /** Shared oracle fragment: per-(doc, word) BPE symbol sequences over
    * `docsRel` as CTEs `mg, w, dw, it, bq`; the caller appends its own
    * final select over [[lastCte]] (= `bq`, columns doc_id / word_idx
    * / seq) and must open its statement with `WITH RECURSIVE` (legal
    * even when the other CTEs are plain).
    *
    * Two scale moves, both forced by growing the fixture from 64 toy
    * merges to 768:
    *
    *  - the merge fold walks DISTINCT words only and `bq` joins the
    *    sequences back to the occurrence stream — the oracle-side
    *    mirror of the engine's per-thread word memoization (a Zipfian
    *    corpus re-tokenizes the same words constantly; folding per
    *    occurrence costs occurrences/distinct ≈ 10³ more for
    *    identical output);
    *  - the merges ride a generated VALUES table driven through ONE
    *    recursive CTE (`it` applies merge k at recursion depth k — the
    *    same sequential left-fold the engine runs, one level per
    *    merge) instead of one chained CTE per merge: the chained form
    *    binds against DuckDB's max_expression_depth of 1000 at ~900
    *    merges and pays binder cost super-linear in the chain length
    *    (measured 49 s/statement at 768 CTEs vs 2 s recursive), so the
    *    recursive form is what keeps the replay pattern valid at
    *    real-tokenizer vocabulary sizes (10k-100k merges). */
  private[graft] def bpeCtesFrom(docsRel: String): String = {
    val split =
      """[x for x in string_split_regex(trim(replace(replace(lower(text), '␟', ''), '▁', '')), '\s+') if x != '']"""
    val vals = Bpe.merges.zipWithIndex.map { case ((a, b), k) =>
      s"($k, '${esc(a)}', '${esc(b)}')"
    }.mkString(", ")
    s"""mg(k, a, b) AS (SELECT * FROM (VALUES $vals)),
       |w AS (
       |  SELECT doc_id, unnest($split) AS word,
       |         generate_subscripts($split, 1) AS word_idx
       |  FROM $docsRel),
       |dw AS (SELECT DISTINCT word FROM w),
       |it AS (
       |  SELECT word,
       |         ['▁'] || [word[i:i] for i in range(1, len(word)+1)] AS seq,
       |         0 AS k
       |  FROM dw
       |  UNION ALL
       |  SELECT it.word,
       |         list_reduce(list_transform(it.seq, x -> [x]),
       |           (acc, e) -> CASE WHEN acc[-1] = mg.a AND e[1] = mg.b
       |                            THEN acc[:-2] || [mg.a || mg.b]
       |                            ELSE acc || e END) AS seq,
       |         it.k + 1 AS k
       |  FROM it JOIN mg ON mg.k = it.k),
       |bq AS (
       |  SELECT w.doc_id, w.word_idx, m.seq
       |  FROM w JOIN (SELECT word, seq FROM it WHERE k = ${Bpe.merges.length}) m
       |    USING (word))""".stripMargin
  }

  private[graft] lazy val bpeCtes: String = bpeCtesFrom("documents")

  private[graft] lazy val lastCte: String = "bq"

  /** Per-doc flattened token list (empty docs kept with []). */
  private lazy val docToksCte: String =
    s"""dt AS (
       |  SELECT doc_id, flatten(list(seq ORDER BY word_idx)) AS toks
       |  FROM $lastCte GROUP BY doc_id),
       |t AS (
       |  SELECT a.doc_id, coalesce(dt.toks, CAST([] AS VARCHAR[])) AS toks
       |  FROM (SELECT doc_id FROM documents) a LEFT JOIN dt USING (doc_id))""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // Full tokenizer output pinned per document: the exact token
    // stream (md5 of the space-join — tokens never contain
    // whitespace, so the join is unambiguous), the subword count, the
    // word count (each word carries exactly one ▁ boundary glyph, so
    // words = ▁ occurrences in the join), and the exact-division
    // fertility stat (tokens per word; IEEE division is
    // correctly-rounded, so the double is bit-identical cross-engine).
    QueryDef(
      "t_tokenize",
      (s, d) => {
        import s.implicits._
        // ONE tokenizer evaluation per row: count and word count both
        // derive from the joined stream (tokens never contain spaces;
        // each word carries exactly one boundary glyph)
        table(s, d, "documents")
          .select($"doc_id", array_join(bpeTokens($"text"), " ").as("__j"))
          .select($"doc_id", $"__j",
            when(length($"__j") === 0, lit(0L))
              .otherwise(length($"__j") - length(translate($"__j", " ", "")) + 1L)
              .cast("long").as("n_bpe_tokens"),
            (length($"__j") - length(translate($"__j", Bpe.Boundary, "")))
              .cast("long").as("n_words"))
          .select($"doc_id", $"n_words", $"n_bpe_tokens",
            ($"n_bpe_tokens".cast("double") /
              greatest($"n_words", lit(1L)).cast("double")).as("tokens_per_word"),
            md5($"__j").as("bpe_md5"))
          .orderBy($"doc_id")
      },
      Some(
        s"""WITH RECURSIVE $bpeCtes,
           |$docToksCte,
           |j AS (
           |  SELECT doc_id, array_to_string(toks, ' ') AS joined,
           |         CAST(len(toks) AS BIGINT) AS n_bpe_tokens
           |  FROM t)
           |SELECT doc_id,
           |       CAST(len(joined) - len(replace(joined, '▁', '')) AS BIGINT) AS n_words,
           |       n_bpe_tokens,
           |       CAST(n_bpe_tokens AS DOUBLE) /
           |         CAST(greatest(len(joined) - len(replace(joined, '▁', '')), 1) AS DOUBLE)
           |         AS tokens_per_word,
           |       md5(joined) AS bpe_md5
           |FROM j ORDER BY doc_id""".stripMargin)),

    // Subword vocabulary usage: corpus-wide BPE token frequencies,
    // top 100 — the "is the learned vocabulary actually load-bearing"
    // audit a tokenizer build runs (unmerged single chars ranking
    // high = undertrained merges). Same explode -> count shape as
    // t_vocab; at 100 TB the shuffle carries ~vocab-size rows after
    // map-side combine, not token occurrences.
    QueryDef(
      "t_vocab_bpe",
      (s, d) => {
        import s.implicits._
        table(s, d, "documents")
          .select(explode(bpeTokens($"text")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("freq"))
          .orderBy($"freq".desc, $"token".asc)
          .limit(100)
      },
      Some(
        s"""WITH RECURSIVE $bpeCtes
           |SELECT token, count(*) AS freq
           |FROM (SELECT unnest(seq) AS token FROM $lastCte) t
           |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin)),

    // Vocabulary coverage per language — the audit a tokenizer build
    // runs before committing a vocab: what fraction of the corpus's
    // subword stream lands in the top-64 tokens (freq desc, token asc
    // tie-break — deterministic boundary). A language whose coverage
    // lags is under-served by the learned merges. Scale shape: the
    // leased tokenize pass feeds the vocab aggregate and the coverage
    // join; the top-64 relation broadcasts; output is
    // language-bounded. Coverage is one exact IEEE division.
    QueryDef(
      "t_vocab_coverage",
      (s, d) => {
        import s.implicits._
        val toks = graft.ops.Checkpoints.lease("vocab_cov",
          table(s, d, "documents")
            .select($"lang", explode(bpeTokens($"text")).as("token")))
        val top = toks.groupBy($"token")
          .agg(count(lit(1)).as("__f"))
          .orderBy($"__f".desc, $"token".asc)
          .limit(64)
          .select($"token", lit(1L).as("__in"))
        toks.join(broadcast(top), Seq("token"), "left")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(coalesce($"__in", lit(0L))).as("n_in_vocab"))
          .withColumn("coverage",
            $"n_in_vocab".cast("double") / $"n_tokens")
          .orderBy($"lang")
      },
      Some(
        s"""WITH RECURSIVE $bpeCtes,
           |tk AS (SELECT doc_id, unnest(seq) AS token FROM $lastCte),
           |tl AS (SELECT d.lang, tk.token
           |       FROM tk JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)),
           |top AS (SELECT token FROM (
           |  SELECT token, count(*) AS f FROM tk GROUP BY token
           |  ORDER BY f DESC, token ASC LIMIT 64))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           |       CAST(sum(CASE WHEN token IN (SELECT token FROM top)
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
           |       CAST(sum(CASE WHEN token IN (SELECT token FROM top)
           |                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS coverage
           |FROM tl GROUP BY lang ORDER BY lang""".stripMargin)),

    // Token-window chunking over REAL subword budgets (width 64,
    // stride 48): the BPE twin of t_chunk — same fan-out shape, chunk
    // content pinned by md5 over the exact subword stream.
    QueryDef(
      "t_chunk_bpe",
      (s, d) => {
        import s.implicits._
        TextAnalysis.chunkWindows(table(s, d, "documents"), $"doc_id", $"text",
            width = 64, stride = 48, tok = bpeTokens)
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(
        s"""WITH RECURSIVE $bpeCtes,
           |$docToksCte,
           |c AS (
           |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |         unnest(range(0, greatest(len(toks), 1), 48)) AS chunk_start,
           |         toks
           |  FROM t)
           |SELECT doc_id, n_tokens,
           |       CAST(chunk_start / 48 AS BIGINT) AS chunk_idx,
           |       CAST(chunk_start AS BIGINT) AS chunk_start,
           |       CAST(least(64, n_tokens - chunk_start) AS BIGINT) AS n_chunk_tokens,
           |       md5(array_to_string(toks[chunk_start+1:chunk_start+64], ' ')) AS chunk_md5
           |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Training-shard packing over real subword budgets: the BPE twin
    // of t_pack (same bucketed two-phase prefix sum — see
    // TextAnalysis.packShards), budget 5000 subwords per shard.
    QueryDef(
      "t_pack_bpe",
      (s, d) => {
        import s.implicits._
        TextAnalysis.packShards(table(s, d, "documents"), $"doc_id", $"text",
            budget = 5000L, bucketWidth = 100L, tok = bpeTokens)
          .orderBy($"doc_id")
      },
      Some(
        s"""WITH RECURSIVE $bpeCtes,
           |cnt AS (
           |  SELECT doc_id, CAST(sum(len(seq)) AS BIGINT) AS n FROM $lastCte GROUP BY doc_id),
           |t AS (
           |  SELECT a.doc_id, coalesce(cnt.n, 0) AS n_tokens
           |  FROM (SELECT doc_id FROM documents) a LEFT JOIN cnt USING (doc_id)),
           |o AS (
           |  SELECT doc_id, n_tokens,
           |         CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
           |  FROM t)
           |SELECT doc_id, n_tokens, token_offset,
           |       CAST(floor(CAST(token_offset AS DOUBLE) / 5000.0) AS BIGINT) AS shard
           |FROM o ORDER BY doc_id""".stripMargin)))
}
