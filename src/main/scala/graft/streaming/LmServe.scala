package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Streaming LM quality scoring: arriving documents scored per row
  * against a broadcast bigram add-one LM trained once on the batch
  * corpus — the online form of `t_lm_score`, in the same
  * watermark-free broadcast-index shape as [[AnnServe]] and
  * [[NearDup.withOnlineDecontamination]]:
  *
  *  - the MODEL is the t_lm_score training artifact (bigram counts,
  *    unigram counts, vocabulary size), built by the same Spark
  *    aggregates the batch query runs, collected behind a loud size
  *    guard and broadcast;
  *  - each arriving row tokenizes Spark-side (the SAME fused
  *    [[graft.functions.TextShingles.wordTokens]] expression — no JVM
  *    re-tokenization to drift) and the per-partition scorer walks the
  *    token pairs against the broadcast maps, accumulating the SAME
  *    integer-bit surprisal `floor(log2(d/n))` via long shifts. No
  *    join, no shuffle, no state: a single map stage, stream == batch
  *    by construction (StreamLmSpec replays micro-batches).
  *
  * Out-of-vocabulary arrivals are first-class (the point of scoring a
  * STREAM against a FROZEN model): an unseen bigram scores
  * `n = 0 + 1`, an unseen prefix `d = 0 + V` — add-one smoothing
  * needs no renormalization and the integer-bit math is total.
  *
  * Scale shape: the broadcast is the pruned model table, guarded like
  * the decontamination blocklist (a 100 TB corpus's UNPRUNED bigram
  * table is not broadcastable; the deployment prunes to top-N
  * bigrams — a strict filter on the count aggregate — or shards the
  * model and merges per-shard partial sums, both structural no-ops
  * here). Scoring throughput is embarrassingly parallel: rows never
  * meet each other.
  */
object LmServe {

  /** Broadcast LM: bigram / unigram occurrence counts + vocabulary
    * size. Keys are `w1 + " " + w2` (tokens are whitespace-split, so
    * the space separator can never collide). */
  case class LmModel(
      bigram: java.util.HashMap[String, Long],
      unigram: java.util.HashMap[String, Long],
      v: Long) extends Serializable

  /** Train the model with the exact aggregates `t_lm_score` runs,
    * collected behind a loud cap — an unbounded model must fail here,
    * not OOM the driver. */
  /** The model's two count frames — the artifact `w_lm_stored` dumps:
    * bigram counts (w1, w2, cb) and unigram counts (w1, cw). Strings
    * and exact longs — parquet round-trips them exactly. */
  private[streaming] def lmCountFrames(
      corpus: DataFrame, text: Column): (DataFrame, DataFrame) = {
    // lease the tokenize pass and both aggregates so the corpus is
    // scanned once and each consuming action reads a materialized
    // stage, not a re-derived lineage
    val toks = graft.ops.Checkpoints.lease("lm_build_toks", corpus.select(
      graft.functions.TextShingles.wordTokens(text).as("toks")))
    val m = greatest(size(col("toks")) - 1, lit(0))
    val bg = graft.ops.Checkpoints.lease("lm_build_bg", toks
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), m).as("w1"),
        slice(col("toks"), lit(2), m).as("w2"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb")))
    val uni = graft.ops.Checkpoints.lease("lm_build_uni",
      toks.select(explode(col("toks")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("cw")))
    (bg, uni)
  }

  /** Collect count frames into the broadcast model behind the loud
    * cap — an unbounded model must fail here, not OOM the driver. */
  def lmModelFromFrames(
      bg: DataFrame, uni: DataFrame,
      maxEntries: Long = 64L << 20): LmModel = {
    val nEntries = bg.agg(count(lit(1))).head().getLong(0) +
      uni.agg(count(lit(1))).head().getLong(0)
    require(nEntries <= maxEntries,
      s"LM too large to serve from one broadcast: $nEntries entries > " +
        s"$maxEntries — prune the model (min-count filter) or shard it")
    val bmap = new java.util.HashMap[String, Long]()
    bg.collect().foreach(r =>
      bmap.put(r.getString(0) + " " + r.getString(1), r.getLong(2)))
    val umap = new java.util.HashMap[String, Long]()
    uni.collect().foreach(r => umap.put(r.getString(0), r.getLong(1)))
    LmModel(bmap, umap, umap.size.toLong)
  }

  def buildLmModel(
      corpus: DataFrame, text: Column,
      maxEntries: Long = 64L << 20): LmModel = {
    val (bg, uni) = lmCountFrames(corpus, text)
    lmModelFromFrames(bg, uni, maxEntries)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sum_bits", LongType, nullable = false),
    StructField("avg_bits", DoubleType, nullable = false)))

  /** (pair count, total surprisal bits) of a token sequence under the
    * model — the shared scoring loop; `floor(log2(d/n))` by pure long
    * shifts, exactly what the batch oracle replays in integer SQL. */
  private def scorePairs(toks: scala.collection.Seq[String], m: LmModel): (Long, Long) = {
    var sum = 0L
    var i = 1
    while (i < toks.length) {
      val w1 = toks(i - 1)
      val cb = m.bigram.getOrDefault(w1 + " " + toks(i), 0L)
      val cw = m.unigram.getOrDefault(w1, 0L)
      sum += graft.functions.IntBits.bits(cb + 1L, cw + m.v)
      i += 1
    }
    (math.max(toks.length - 1, 0).toLong, sum)
  }

  /** Append `avg_bits` to every input row, schema otherwise untouched
    * — the GATE form of the scorer, composable into streaming
    * pipelines (`w_corpus`). Documents with fewer than two tokens
    * carry 0.0 (no evidence — they pass an upper-bound gate; the
    * length gates catch them). Stateless map, batch == stream. */
  def withLmScoreColumn(docs: DataFrame, text: Column, model: LmModel): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(model)
    val withToks = docs.withColumn("__lmtoks",
      graft.functions.TextShingles.wordTokens(text))
    val tokIdx = withToks.schema.fields.length - 1
    val outSchema = StructType(docs.schema.fields :+
      StructField("avg_bits", DoubleType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withToks.mapPartitions { rows =>
      val m = bModel.value
      rows.map { r =>
        val toks = r.getSeq[String](tokIdx)
        val (nb, sum) = scorePairs(toks, m)
        val avg = if (nb == 0L) 0.0 else sum.toDouble / nb
        Row.fromSeq(r.toSeq.init :+ avg)
      }
    }(enc)
  }

  /** Score each row of a batch OR streaming DataFrame: per-pair
    * integer surprisal bits against the broadcast model, summed.
    * Documents with fewer than two tokens emit nothing (the batch
    * contract). `floor(log2(d/n))` is the same pure-shift loop the
    * batch oracle replays in integer SQL. */
  def withOnlineLmScore(
      docs: DataFrame, id: Column, text: Column,
      model: LmModel): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(model)
    val prepped = docs.select(id.as("__id"),
      graft.functions.TextShingles.wordTokens(text).as("__toks"))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepped.mapPartitions { rows =>
      val m = bModel.value
      rows.flatMap { r =>
        val did = r.getLong(0)
        val toks = r.getSeq[String](1)
        if (toks.length < 2) Iterator.empty
        else {
          val (nb, sum) = scorePairs(toks, m)
          Iterator.single(Row(did, nb, sum, sum.toDouble / nb))
        }
      }
    }(enc)
  }

  private val excessSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("pool_bits", DoubleType, nullable = false),
    StructField("target_bits", DoubleType, nullable = false),
    StructField("excess_bits", DoubleType, nullable = false)))

  /** Score each row of a batch OR streaming frame under TWO frozen
    * broadcast models — the pool LM and the target-slice reference LM
    * — emitting per-doc pool/target/excess bits: the online twin of
    * [[graft.ops.LmScore.excessLmSelect]]'s scoring stage (selection
    * is a corpus-order statistic and stays batch-side; an online
    * deployment thresholds on a frozen excess cutoff instead). Both
    * models ride [[LmModel]] unchanged — the target model is just the
    * LM trained on the target slice, so its add-one smoothing,
    * vocabulary size, and OOV handling are exactly the batch form's
    * shared-count algebra (cwt/cbt with vst). Documents with fewer
    * than two tokens emit nothing. Stateless map, batch == stream. */
  def withOnlineExcessScore(
      docs: DataFrame, id: Column, text: Column,
      pool: LmModel, target: LmModel): DataFrame = {
    val bPool = docs.sparkSession.sparkContext.broadcast(pool)
    val bTarget = docs.sparkSession.sparkContext.broadcast(target)
    val prepped = docs.select(id.as("__id"),
      graft.functions.TextShingles.wordTokens(text).as("__toks"))
    val enc = org.apache.spark.sql.Encoders.row(excessSchema)
    prepped.mapPartitions { rows =>
      val mp = bPool.value
      val mt = bTarget.value
      rows.flatMap { r =>
        val did = r.getLong(0)
        val toks = r.getSeq[String](1)
        if (toks.length < 2) Iterator.empty
        else {
          val (nb, sp) = scorePairs(toks, mp)
          val (_, st) = scorePairs(toks, mt)
          val pb = sp.toDouble / nb
          val tb = st.toDouble / nb
          Iterator.single(Row(did, nb, pb, tb, pb - tb))
        }
      }
    }(enc)
  }

  private val lmStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  private lazy val lmOracle: String = lmOracleFor("documents")

  /** The LM scoring replay parameterized by the TRAINING corpus
    * relation — the takedown form replays training on the corpus
    * minus the tombstoned documents, which is exactly what count
    * subtraction on the stored artifact must equal (scored documents
    * stay the untombstoned first 100, in-corpus either way). */
  private def lmOracleFor(corpusRel: String): String = s"""WITH t AS (
                SELECT doc_id,
                       [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                FROM $corpusRel),
              uni AS (
                SELECT w1, count(*) AS cw
                FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY w1),
              v AS (SELECT count(*) AS vs FROM uni),
              bg AS (
                SELECT doc_id, b.w1 AS w1, b.w2 AS w2
                FROM (SELECT doc_id,
                             unnest([{'w1': toks[i], 'w2': toks[i+1]}
                                     for i in range(1, len(toks))]) AS b
                      FROM t)),
              cnt AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
              sc AS (
                SELECT bg.doc_id,
                       CAST(cnt.cb + 1 AS BIGINT) AS n,
                       CAST(uni.cw + v.vs AS BIGINT) AS d
                FROM bg JOIN cnt USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
              k AS (
                SELECT doc_id,
                       CASE WHEN (n << (length(bin(d)) - length(bin(n)))) <= d
                            THEN length(bin(d)) - length(bin(n))
                            ELSE length(bin(d)) - length(bin(n)) - 1 END AS bits
                FROM sc)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(bits) AS BIGINT) AS sum_bits,
                     CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
              FROM k WHERE doc_id < 100
              GROUP BY doc_id ORDER BY doc_id"""

  val queries: Seq[QueryDef] = Seq(

    // Streaming LM scoring under batch execution: the first 100
    // documents replayed as arrivals against the model trained on the
    // FULL corpus. Every arrival is in-corpus, so the scores are
    // exactly t_lm_score's rows for those ids — the oracle is the
    // batch oracle restricted, which holds the JVM shift-loop scorer
    // to bit-equality with the column-algebra form.
    QueryDef(
      "w_lm_score",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val model = buildLmModel(docs, $"text")
        withOnlineLmScore(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(lmOracle)),

    // ONLINE excess scoring under batch execution: the first 100
    // documents replayed as arrivals against TWO frozen models (pool
    // + en-slice reference, both loud-capped collects). Every arrival
    // is in-corpus, so the rows are exactly t_select_excess's perdoc
    // rows for those ids — the shared oracle holds the JVM two-model
    // shift-loop scorer to bit-equality with the column-algebra form.
    QueryDef(
      "w_select_excess",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val pool = buildLmModel(docs, $"text")
        val target = buildLmModel(docs.filter($"lang" === "en"), $"text")
        withOnlineExcessScore(docs.filter($"doc_id" < 100), $"doc_id",
            $"text", pool, target)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${graft.ops.LmScore.excessPerDocCtes}
              SELECT doc_id, n_bigrams, pool_bits, target_bits, excess_bits
              FROM perdoc WHERE doc_id < 100 ORDER BY doc_id""")),

    // The durable LM-serving cycle: the model's two count frames are
    // WRITTEN to parquet and RELOADED before the broadcast model is
    // collected — the scoring job needs zero knowledge of how the
    // model was trained (no tokenize/aggregate subtree, no lease;
    // plain parquet scans feed the guard + collects). Strings and
    // exact longs round-trip exactly, so the same oracle covers both.
    QueryDef(
      "w_lm_stored",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "lmstore",
          lmStoreSeq.incrementAndGet())
        val (bg, uni) = lmCountFrames(docs, $"text")
        graft.ops.IndexStore.save(root, "lm_bigrams" -> bg, "lm_unigrams" -> uni)
        val model = lmModelFromFrames(
          graft.ops.IndexStore.load(s, root, "lm_bigrams"),
          graft.ops.IndexStore.load(s, root, "lm_unigrams"))
        withOnlineLmScore(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(lmOracle)),

    // Model TAKEDOWN — EXACT count-model unlearning by artifact
    // surgery: per-document bigram/unigram counts are additive with
    // no cross-document terms, so "forget documents 100-199" is ONE
    // count pass over just the tombstoned docs subtracted from the
    // stored frames (rows at zero drop out, and the vocabulary size
    // recounts itself from the surviving unigram frame) — provably
    // equal to retraining on the corpus minus the tombstones, WITHOUT
    // ever rescanning the surviving corpus. At 100 TB that is the
    // difference between a bounded forget-job (scan only what is
    // forgotten, rewrite two count artifacts) and a full retrain. The
    // oracle IS the retrain: lmOracle over the filtered corpus —
    // scored docs (< 100) are untombstoned and in-corpus either way,
    // so every count they touch stays >= 1 and the replay is total.
    QueryDef(
      "w_lm_takedown",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "lmtakedown",
          lmStoreSeq.incrementAndGet())
        val (bg, uni) = lmCountFrames(docs, $"text")
        graft.ops.IndexStore.save(root, "lm_bigrams" -> bg, "lm_unigrams" -> uni)
        // the forget-side counts: the SAME aggregates over ONLY the
        // tombstoned docs (the second lmCountFrames call releases the
        // build leases, which save() already consumed)
        val (bgT, uniT) = lmCountFrames(
          docs.filter($"doc_id" >= 100 && $"doc_id" < 200), $"text")
        val bgLive = graft.ops.IndexStore.load(s, root, "lm_bigrams")
          .join(bgT.select($"w1", $"w2", $"cb".as("__ct")), Seq("w1", "w2"), "left")
          .select($"w1", $"w2", ($"cb" - coalesce($"__ct", lit(0L))).as("cb"))
          .filter($"cb" > 0)
        val uniLive = graft.ops.IndexStore.load(s, root, "lm_unigrams")
          .join(uniT.select($"w1", $"cw".as("__ct")), Seq("w1"), "left")
          .select($"w1", ($"cw" - coalesce($"__ct", lit(0L))).as("cw"))
          .filter($"cw" > 0)
        // in-place rewrite is safe: save() stages to a temp dir before
        // the atomic rename, so the subtraction reads the old frames
        // in full while writing the new ones
        graft.ops.IndexStore.save(root,
          "lm_bigrams" -> bgLive, "lm_unigrams" -> uniLive)
        val model = lmModelFromFrames(
          graft.ops.IndexStore.load(s, root, "lm_bigrams"),
          graft.ops.IndexStore.load(s, root, "lm_unigrams"))
        withOnlineLmScore(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(lmOracleFor(
        "(SELECT * FROM documents WHERE doc_id < 100 OR doc_id >= 200)"))),

    // Model ADD — the day-2 half of the same additivity argument:
    // ingesting a new batch into the count model is one count pass
    // over JUST the batch summed into the stored frames (union +
    // group-sum; new words simply appear, and the vocabulary recounts
    // itself) — provably equal to retraining on corpus + batch,
    // without rescanning the corpus. Together with w_lm_takedown this
    // closes the add/remove symmetry for the LM broadcast class the
    // way s_ann_ivf_add / s_ann_ivf_del close it for the batch index
    // classes. The batch is the first 30 docs' 40-char prefixes under
    // shifted ids (the dd_lsh_increment fixture), so the oracle is
    // the retrain over the unioned relation.
    QueryDef(
      "w_lm_add",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "lmadd",
          lmStoreSeq.incrementAndGet())
        val (bg, uni) = lmCountFrames(docs, $"text")
        graft.ops.IndexStore.save(root, "lm_bigrams" -> bg, "lm_unigrams" -> uni)
        val batch = docs.filter($"doc_id" < 30)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            substring($"text", 1, 40).as("text"))
        val (bgB, uniB) = lmCountFrames(batch, $"text")
        val bgLive = graft.ops.IndexStore.load(s, root, "lm_bigrams")
          .unionByName(bgB)
          .groupBy($"w1", $"w2").agg(sum($"cb").as("cb"))
        val uniLive = graft.ops.IndexStore.load(s, root, "lm_unigrams")
          .unionByName(uniB)
          .groupBy($"w1").agg(sum($"cw").as("cw"))
        graft.ops.IndexStore.save(root,
          "lm_bigrams" -> bgLive, "lm_unigrams" -> uniLive)
        val model = lmModelFromFrames(
          graft.ops.IndexStore.load(s, root, "lm_bigrams"),
          graft.ops.IndexStore.load(s, root, "lm_unigrams"))
        withOnlineLmScore(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(lmOracleFor(
        """(SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 2000000 AS doc_id, substring(text, 1, 40) AS text
            FROM documents WHERE doc_id < 30)"""))))
}
