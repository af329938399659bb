package graft.ops

import graft.QueryDef
import graft.functions.PortableHash
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing: deterministic weighted sampling and
  * length-bucketed batch assignment. Both ride the
  * [[Selection]] two-phase bucketed decomposition — no corpus-sized
  * structure ever crosses a single-partition exchange — and both are
  * fully hash-oracled: the order key is the portable 60-bit md5 hash,
  * so DuckDB replays the identical sample / batch assignment.
  */
object Curate {

  /** Portable per-document order hash (shared by both operators):
    * deterministic, uncorrelated with doc_id order, identical in
    * DuckDB ([[PortableHash]]). */
  private def orderHash(docId: Column): Column =
    PortableHash.md5Hash60(docId.cast("string"))

  /** Deterministic SYSTEMATIC weighted sampling: order the corpus by
    * the portable hash (a fixed random permutation), take the running
    * token-weight sum S_i, and select every document whose weight
    * interval (S_i, S_i + w_i] crosses a multiple of total/m — the
    * classic systematic (fixed-interval) sample, inclusion probability
    * proportional to token weight, no RNG, no driver round-trip.
    * Exactly <= m documents are selected (one per crossed boundary; a
    * document heavier than the stride absorbs several boundaries but
    * is emitted once).
    *
    * Scale shape: the running sum is [[Selection.withRunningTotals]]'s
    * bucketed two-phase plan keyed on the hash's high bits (<= 2^16
    * buckets regardless of corpus size), and the corpus total rides
    * the same broadcast bucket table — two scans of the leased
    * (doc_id, weight, hash) projection, zero unpartitioned windows.
    * The boundary test is exact long arithmetic; the in-plan
    * assert_true fails loudly past w_total * m ~ 2^62 (right-shift the
    * weights first — the sample is stride-scale-invariant) instead of
    * silently wrapping. */
  def systematicSample(
      docs: DataFrame, docId: Column, text: Column, m: Int): DataFrame = {
    import docs.sparkSession.implicits._
    require(m > 0, s"sample size m must be positive, got $m")
    val in = Checkpoints.lease("curate_sample",
      docs.select(docId.as("doc_id"),
        size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"),
        orderHash(docId).as("__h")))
    val run = Selection.withRunningTotals(in, shiftright($"__h", 44),
      Seq($"__h".asc, $"doc_id".asc), $"n_tokens", "w_before", "w_total")
    val guard = assert_true(
      $"w_total" > 0L && $"w_total" < lit(Long.MaxValue / (2L * m)),
      lit(s"systematic sample: total weight * m would overflow exact long " +
        s"arithmetic (or the corpus has zero total weight) — right-shift " +
        s"the per-document weights by a common power of two first (the " +
        s"selected set is invariant under a common weight scale)"))
    run
      .withColumn("selected", when(guard.isNull,
        expr(s"((w_before + n_tokens) * $m) div w_total") >
          expr(s"(w_before * $m) div w_total")))
      .select($"doc_id", $"n_tokens", $"w_before", $"selected")
  }

  /** Length-bucketed batch assignment (the padding-minimizing batching
    * a training loop wants): documents are banded by token length
    * (`n_tokens div bandWidth`, capped at `maxBand`), ordered inside
    * each band by the portable hash, and grouped into consecutive
    * batches of `batchSize`. Same-batch documents therefore have
    * near-equal lengths — padding waste is bounded by bandWidth — and
    * the hash order makes each batch an unbiased draw from its band.
    *
    * Scale shape: the in-band rank is the GLOBAL two-phase rank along
    * (band, hash, doc_id) minus the band's start offset — a
    * [[Selection.withGlobalRank]] over hash-prefix buckets plus one
    * broadcast join against the (maxBand+1)-row band-offset table.
    * The naive `row_number() OVER (PARTITION BY band)` would put a
    * corpus-sized fraction through one task per band at 100 TB; here
    * the only unpartitioned windows run over the bounded bucket and
    * band tables. */
  def lengthBatches(
      docs: DataFrame, docId: Column, text: Column,
      bandWidth: Int = 64, maxBand: Int = 16, batchSize: Int = 32): DataFrame = {
    import docs.sparkSession.implicits._
    require(bandWidth > 0 && maxBand >= 0 && batchSize > 0,
      s"bad batching params ($bandWidth, $maxBand, $batchSize)")
    val in = Checkpoints.lease("curate_bylen",
      docs.select(docId.as("doc_id"),
          size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"),
          orderHash(docId).as("__h"))
        .withColumn("len_band",
          least(expr(s"n_tokens div $bandWidth"), lit(maxBand.toLong))))
    val ranked = Selection.withGlobalRank(in,
      $"len_band" * lit(65536L) + shiftright($"__h", 44),
      Seq($"len_band".asc, $"__h".asc, $"doc_id".asc), "__grank")
    // bounded-global-window: band offsets — one aggregate down to
    // <= maxBand+1 rows, then the only other global window in the plan
    // runs over that bounded band table, never the corpus
    val wPrev = Window.orderBy($"len_band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = in.groupBy($"len_band").agg(count(lit(1)).as("__bn"))
      .withColumn("__boff", coalesce(sum($"__bn").over(wPrev), lit(0L)))
      .select($"len_band", $"__boff")
    ranked.join(broadcast(boff), Seq("len_band"))
      .withColumn("batch", expr(s"(__grank - __boff - 1) div $batchSize"))
      .select($"doc_id", $"n_tokens", $"len_band", $"batch")
  }

  /** Exact token-boundary packing with document SPILL across shards —
    * what an LLM dataloader actually materializes: every shard holds
    * EXACTLY `budget` tokens (the last one excepted), so a document
    * whose token interval [offset, offset + n) crosses shard
    * boundaries emits one SEGMENT row per shard it touches, with the
    * in-document token slice (`tok_start`, `tok_len`) each shard takes.
    * [[TextAnalysis.packShards]] assigns whole documents by their
    * START offset (shards overflow by up to one document); this
    * operator is the exact-budget refinement a tokenizer-side packer
    * consumes directly.
    *
    * Scale shape: the offsets are packShards' bucketed two-phase
    * prefix sum unchanged; the segment fan-out is one in-row
    * `explode(sequence(...))` — a document emits
    * ceil(n / budget) + 1 segments at most, so the output stays
    * O(corpus tokens / budget + docs) with zero additional shuffles
    * or windows. Zero-token documents emit nothing (no shard takes a
    * slice of them). */
  def packSegments(
      docs: DataFrame, docId: Column, text: Column,
      budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    TextAnalysis.packShards(docs, docId, text, budget, bucketWidth)
      .drop("shard")
      .filter(col("n_tokens") > 0L)
      .withColumn("shard", explode(sequence(
        expr(s"token_offset div $budget"),
        expr(s"(token_offset + n_tokens - 1) div $budget"))))
      .withColumn("tok_start",
        greatest(col("shard") * budget - col("token_offset"), lit(0L)))
      .withColumn("tok_len",
        least((col("shard") + 1L) * budget, col("token_offset") + col("n_tokens"))
          - greatest(col("shard") * budget, col("token_offset")))
  }

  val queries: Seq[QueryDef] = Seq(

    // Systematic weighted sampling (see systematicSample): m = 200
    // boundaries over the token-weight line, hash order. The oracle
    // replays the permutation, the running sum, and the exact integer
    // boundary test in one global window (sound at oracle scale; the
    // engine side is the bucketed two-phase plan).
    QueryDef(
      "t_sample_weighted",
      (s, d) => {
        import s.implicits._
        systematicSample(table(s, d, "documents"), $"doc_id", $"text", m = 200)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS n_tokens,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM documents),
              o AS (
                SELECT doc_id, n_tokens,
                       CAST(coalesce(SUM(n_tokens) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS w_before,
                       CAST(SUM(n_tokens) OVER () AS BIGINT) AS w_total
                FROM t)
              SELECT doc_id, n_tokens, w_before,
                     ((w_before + n_tokens) * 200) // w_total > (w_before * 200) // w_total AS selected
              FROM o ORDER BY doc_id""")),

    // Corpus-RELATIVE quality selection: keep the top half by the
    // composite quality score — the threshold adapts to the corpus
    // (t_quality_filter keeps everything above an ABSOLUTE bar; a
    // curation pipeline usually wants "the best X% of what we have").
    // One scan for the score, then topFracByOrder's bucketed rank —
    // quality lives in [0,1] so the 1/1024-quantized bucket table
    // holds <= 1025 rows at any corpus size.
    QueryDef(
      "t_select_quality",
      (s, d) => {
        import s.implicits._
        val q = table(s, d, "documents")
          .withColumn("__toks", TextAnalysis.tokens($"text"))
          .select($"doc_id",
            TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
        Selection.topFracByOrder(q,
            floor(-$"quality" * lit(1024.0)),
            Seq($"quality".desc, $"doc_id".asc), 0.5, "selected")
          .orderBy($"doc_id")
      },
      Some(s"""WITH q AS (
                SELECT doc_id, ${TextAnalysis.duckdbQuality("text", "toks")} AS quality
                FROM (SELECT doc_id, text,
                             [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                      FROM documents)),
              r AS (
                SELECT doc_id, quality,
                       row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS rn,
                       count(*) OVER () AS n_docs
                FROM q)
              SELECT doc_id, quality, rn <= ceil(n_docs * 0.5) AS selected
              FROM r ORDER BY doc_id""")),

    // ONLINE quality gating from the FROZEN corpus-relative threshold
    // — the serving form of t_select_quality, completing the selection
    // class's batch/online symmetry (DSIR has w_dsir, excess has
    // w_select_excess): the batch phase fixes the top-half quality
    // threshold (the ceil(n/2)-th ranked document's score, one
    // 1-row aggregate over the flagged frame), and arrivals — the
    // first 100 ids replayed, as in the other online twins — are
    // admitted by score >= threshold. Boundary ties can admit MORE
    // than the batch set (a frozen scalar cannot see arrival ranks);
    // that over-admission is the correct serving semantic and the
    // oracle replays it exactly.
    QueryDef(
      "w_select_quality",
      (s, d) => {
        import s.implicits._
        val q = Checkpoints.lease("curate_selq",
          table(s, d, "documents")
            .withColumn("__toks", TextAnalysis.tokens($"text"))
            .select($"doc_id",
              TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality")))
        val thr = Selection.topFracByOrder(q,
            floor(-$"quality" * lit(1024.0)),
            Seq($"quality".desc, $"doc_id".asc), 0.5, "selected")
          .filter($"selected")
          .agg(min($"quality").as("q_threshold"))
        q.filter($"doc_id" < 100)
          .crossJoin(broadcast(thr))
          .withColumn("admitted", $"quality" >= $"q_threshold")
          .orderBy($"doc_id")
      },
      Some(s"""WITH q AS (
                SELECT doc_id, ${TextAnalysis.duckdbQuality("text", "toks")} AS quality
                FROM (SELECT doc_id, text,
                             [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                      FROM documents)),
              r AS (
                SELECT doc_id, quality,
                       row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS rn,
                       count(*) OVER () AS n_docs
                FROM q),
              thr AS (
                SELECT min(quality) AS q_threshold FROM r
                WHERE rn <= ceil(n_docs * 0.5))
              SELECT doc_id, quality, thr.q_threshold,
                     quality >= thr.q_threshold AS admitted
              FROM q CROSS JOIN thr WHERE doc_id < 100 ORDER BY doc_id""")),

    // Exact-budget segment packing (see packSegments): same layout as
    // t_pack (id order, 5000-token shards) but with documents SPLIT at
    // shard boundaries. The oracle replays offsets with one global
    // window and the segment fan-out with range() — tiling arithmetic
    // compared bit-for-bit.
    QueryDef(
      "t_pack_split",
      (s, d) => {
        import s.implicits._
        packSegments(table(s, d, "documents"), $"doc_id", $"text",
            budget = 5000L, bucketWidth = 100L)
          .orderBy($"doc_id", $"shard")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS n_tokens
                FROM documents),
              o AS (
                SELECT doc_id, n_tokens,
                       CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
                FROM t),
              s AS (
                SELECT doc_id, n_tokens, token_offset,
                       CAST(unnest(range(token_offset // 5000, (token_offset + n_tokens - 1) // 5000 + 1)) AS BIGINT) AS shard
                FROM o WHERE n_tokens > 0)
              SELECT doc_id, n_tokens, token_offset, shard,
                     CAST(greatest(shard * 5000 - token_offset, 0) AS BIGINT) AS tok_start,
                     CAST(least((shard + 1) * 5000, token_offset + n_tokens)
                          - greatest(shard * 5000, token_offset) AS BIGINT) AS tok_len
              FROM s ORDER BY doc_id, shard""")),

    // Length-bucketed batching (see lengthBatches): 64-token bands
    // capped at band 16, batches of 32 in portable-hash order. The
    // oracle's per-band row_number pins the two-phase global-rank
    // decomposition (global rank minus band offset == in-band rank).
    QueryDef(
      "t_batch_bylen",
      (s, d) => {
        import s.implicits._
        lengthBatches(table(s, d, "documents"), $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS n_tokens,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM documents),
              b AS (
                SELECT doc_id, n_tokens,
                       CAST(least(n_tokens // 64, 16) AS BIGINT) AS len_band, h
                FROM t),
              r AS (
                SELECT doc_id, n_tokens, len_band,
                       row_number() OVER (PARTITION BY len_band ORDER BY h, doc_id) AS rib
                FROM b)
              SELECT doc_id, n_tokens, len_band,
                     CAST((rib - 1) // 32 AS BIGINT) AS batch
              FROM r ORDER BY doc_id""")),

    // PER-DOMAIN top-fraction selection — the "best 25% of every
    // source" operator a mixing pipeline runs after tagging, and the
    // first user of the Selection primitive's GROUPED form
    // ([[Selection.topFracByOrderPerGroup]]): rank and count run
    // WITHIN each source, so a small pristine source is not crowded
    // out by a large mediocre one (the failure mode of the global
    // t_select_quality cut under heterogeneous sources). Scale shape:
    // strictly better than the global form — the bucket table is
    // |sources| × ≤1025 rows and its prefix window is PARTITIONED by
    // source, so the plan has NO single-partition structure at all.
    QueryDef(
      "t_select_bydomain",
      (s, d) => {
        import s.implicits._
        val q = table(s, d, "documents")
          .withColumn("__toks", TextAnalysis.tokens($"text"))
          .select($"doc_id", $"source",
            TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
        Selection.topFracByOrderPerGroup(q, $"source",
            floor(-$"quality" * lit(1024.0)),
            Seq($"quality".desc, $"doc_id".asc), 0.25, "selected")
          .orderBy($"doc_id")
      },
      Some(s"""WITH q AS (
                SELECT doc_id, source,
                       ${TextAnalysis.duckdbQuality("text", "toks")} AS quality
                FROM (SELECT doc_id, source, text,
                             [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                      FROM documents)),
              r AS (
                SELECT doc_id, source, quality,
                       row_number() OVER (PARTITION BY source
                         ORDER BY quality DESC, doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY source) AS n_docs
                FROM q)
              SELECT doc_id, source, quality,
                     rn <= ceil(n_docs * 0.25) AS selected
              FROM r ORDER BY doc_id""")),

    // ONLINE per-domain quality gating from FROZEN per-domain
    // thresholds — t_select_bydomain's serving form (the
    // w_select_quality move, per group): the batch phase fixes each
    // source's top-quarter threshold (one min per source over the
    // flagged frame — a |sources|-row broadcast artifact), and
    // arrivals are admitted by score >= THEIR source's threshold.
    // Boundary ties can admit more than the batch set per domain (a
    // frozen scalar cannot see arrival ranks) — the correct serving
    // semantic, replayed exactly.
    QueryDef(
      "w_select_bydomain",
      (s, d) => {
        import s.implicits._
        val q = Checkpoints.lease("curate_seldom",
          table(s, d, "documents")
            .withColumn("__toks", TextAnalysis.tokens($"text"))
            .select($"doc_id", $"source",
              TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality")))
        val thr = Selection.topFracByOrderPerGroup(q, $"source",
            floor(-$"quality" * lit(1024.0)),
            Seq($"quality".desc, $"doc_id".asc), 0.25, "selected")
          .filter($"selected")
          .groupBy($"source")
          .agg(min($"quality").as("q_threshold"))
        q.filter($"doc_id" < 100)
          .join(broadcast(thr), Seq("source"))
          .withColumn("admitted", $"quality" >= $"q_threshold")
          .select($"doc_id", $"source", $"quality", $"q_threshold",
            $"admitted")
          .orderBy($"doc_id")
      },
      Some(s"""WITH q AS (
                SELECT doc_id, source,
                       ${TextAnalysis.duckdbQuality("text", "toks")} AS quality
                FROM (SELECT doc_id, source, text,
                             [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                      FROM documents)),
              r AS (
                SELECT doc_id, source, quality,
                       row_number() OVER (PARTITION BY source
                         ORDER BY quality DESC, doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY source) AS n_docs
                FROM q),
              thr AS (
                SELECT source, min(quality) AS q_threshold FROM r
                WHERE rn <= ceil(n_docs * 0.25) GROUP BY source)
              SELECT q.doc_id, q.source, q.quality, thr.q_threshold,
                     q.quality >= thr.q_threshold AS admitted
              FROM q JOIN thr USING (source)
              WHERE q.doc_id < 100 ORDER BY q.doc_id"""))
  )
}
