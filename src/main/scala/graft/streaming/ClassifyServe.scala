package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The frozen naive-Bayes classifier artifact: per-token per-class
  * counts plus the class table — everything
  * [[graft.ops.Classify.nbPredict]]'s scoring stage reads, collected
  * once and broadcast, so arrivals classify without rescanning the
  * training corpus. `classes` is sorted (the alphabetical argmin
  * tie-break is an array-order scan), `dd(c) = n_toks_c + vocab` is
  * the smoothed denominator, `priorBits(c) = bits(n_docs_c, n_docs)`.
  * `hashBuckets` marks the hashed-feature form: the serving tokenizer
  * folds each arrival token to its bucket key before the lookup, so
  * ONE scorer serves either model. */
case class NbModel(
    classes: Array[String],
    priorBits: Array[Long],
    dd: Array[Long],
    counts: Map[String, Array[Long]],
    hashBuckets: Option[Int] = None)

/** ONLINE trained-NB classification — the serving twin of
  * `t_classify_nb`, same shape as the LM/DSIR/excess scorers: the
  * batch phase trains the count model (one aggregation pass, loudly
  * capped collect), serving is a stateless per-row map against the
  * broadcast artifact — batch == stream by construction, and the JVM
  * bits kernel ([[graft.functions.IntBits]]) is the exact
  * `floor(log2(d/n))` the column algebra and the DuckDB oracle
  * compute, so the served predictions are bit-identical to the batch
  * operator's rows for the same ids.
  *
  * Operational closure (the `w_lm_*` symmetry, same additivity
  * argument): the model IS two count frames — the class table
  * (lab, n_docs_s, n_toks_s) and the token counts (w, lab, cws) —
  * and every count is a sum over documents with no cross-document
  * terms. So the artifact round-trips through parquet exactly
  * (`w_classify_stored`), a new batch folds in by union + group-sum
  * (`w_classify_add` == retrain on corpus + batch, without rescanning
  * the corpus), and a takedown subtracts the tombstoned documents'
  * counts with zero rows dropping out and the vocabulary recounting
  * itself from the surviving token frame (`w_classify_takedown` ==
  * retrain on corpus − tombstones, scanning ONLY what is forgotten).
  * At 100 TB that is the difference between a bounded forget/ingest
  * job rewriting two small artifacts and a full retrain. */
object ClassifyServe {

  /** The model's two count frames — what `w_classify_stored` dumps
    * and the add/takedown forms edit: the class table and the
    * per-(feature, class) counts. Strings and exact longs — parquet
    * round-trips them exactly. `featOf` selects the feature space
    * (raw tokens, or [[graft.ops.Classify.hashedFeat]]). */
  private[graft] def nbCountFrames(
      corpus: DataFrame, text: Column, label: Column,
      featOf: Column => Column = identity): (DataFrame, DataFrame) = {
    val toks = graft.ops.Checkpoints.lease("nb_build_toks", corpus.select(
      label.as("lab"),
      graft.functions.TextShingles.wordTokens(text).as("toks")))
    val cls = graft.ops.Checkpoints.lease("nb_build_cls",
      toks.groupBy(col("lab")).agg(
        count(lit(1)).as("n_docs_s"),
        sum(size(col("toks"))).cast("long").as("n_toks_s")))
    val cnt = graft.ops.Checkpoints.lease("nb_build_cnt",
      toks.select(col("lab"), explode(col("toks")).as("__u"))
        .select(col("lab"), featOf(col("__u")).as("w"))
        .groupBy(col("w"), col("lab")).agg(count(lit(1)).as("cws")))
    (cls, cnt)
  }

  /** Collect the count frames into the broadcast model behind the loud
    * cap: vocab past it means the artifact no longer fits serving
    * executors — prune the vocabulary (min-count threshold) or switch
    * to the hashed-feature form (`t_classify_nb_hashed`), which is
    * bucket-bounded and can never trip this. */
  def nbModelFromFrames(
      cls: DataFrame, cnt: DataFrame,
      hashBuckets: Option[Int] = None,
      maxVocab: Int = 4000000): NbModel = {
    val clsRows = cls.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val classes = clsRows.map(_._1)
    val idx = classes.zipWithIndex.toMap
    val nDocs = clsRows.map(_._2).sum
    val vocab = cnt.agg(count_distinct(col("w"))).head().getLong(0)
    require(vocab <= maxVocab,
      s"NB model vocabulary $vocab exceeds the $maxVocab broadcast cap — " +
        s"prune rare tokens or use the hashed-feature form " +
        s"(t_classify_nb_hashed), which is bucket-bounded")
    val priorBits = clsRows.map(c => graft.functions.IntBits.bits(c._2, nDocs))
    val dd = clsRows.map(c => c._3 + vocab)
    val counts = cnt.collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        val arr = Array.fill(classes.length)(0L)
        rows.foreach(r => arr(idx(r.getString(1))) = r.getLong(2))
        w -> arr
      }
    NbModel(classes, priorBits, dd, counts, hashBuckets)
  }

  def buildNbModel(
      docs: DataFrame, docId: Column, text: Column, label: Column,
      maxVocab: Int = 4000000): NbModel = {
    val (cls, cnt) = nbCountFrames(docs, text, label)
    nbModelFromFrames(cls, cnt, None, maxVocab)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pred_lang", StringType, nullable = false),
    StructField("bits_best", LongType, nullable = false)))

  /** Classify each row of a batch OR streaming frame against the
    * frozen model: per-occurrence integer-bit surprisals summed per
    * class (OOV tokens smooth to count 0 — exactly the batch form's
    * left-join coalesce), argmin with the alphabetical tie-break.
    * Zero-token documents emit nothing (no evidence — the batch
    * contract). Hashed models fold each token to its bucket key
    * first ([[graft.functions.PortableHash.md5Hash60Jvm]] — the
    * column form's pmod over a positive hash). Stateless map,
    * batch == stream. */
  def withOnlineNbPredict(
      docs: DataFrame, id: Column, text: Column,
      model: NbModel): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(model)
    val prepped = docs.select(id.as("__id"),
      graft.functions.TextShingles.wordTokens(text).as("__toks"))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepped.mapPartitions { rows =>
      val m = bModel.value
      val k = m.classes.length
      val keyOf: String => String = m.hashBuckets match {
        case Some(b) =>
          w => (graft.functions.PortableHash.md5Hash60Jvm(w) % b).toString
        case None => identity
      }
      rows.flatMap { r =>
        val toks = r.getSeq[String](1)
        if (toks.isEmpty) Iterator.empty
        else {
          val tot = m.priorBits.clone()
          toks.foreach { w =>
            val cw = m.counts.getOrElse(keyOf(w), null)
            var c = 0
            while (c < k) {
              val n = (if (cw == null) 0L else cw(c)) + 1L
              tot(c) += graft.functions.IntBits.bits(n, m.dd(c))
              c += 1
            }
          }
          var best = 0
          var c = 1
          while (c < k) { // strict < keeps the alphabetically first tie
            if (tot(c) < tot(best)) best = c
            c += 1
          }
          Iterator.single(Row(r.getLong(0), m.classes(best), tot(best)))
        }
      }
    }(enc)
  }

  private val nbStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The online replay's oracle: the batch NB chain over `corpusRel`,
    * scored docs restricted to the untombstoned first 100 (in-corpus
    * under every variant, so the replay is total). */
  private def nbServeOracleFor(corpusRel: String): String =
    s"""WITH ${graft.ops.Classify.nbCtesFor(corpusRel)}
        SELECT doc_id, lab AS pred_lang,
               CAST(total AS BIGINT) AS bits_best
        FROM nbr WHERE rk = 1 AND doc_id < 100 ORDER BY doc_id"""

  val queries: Seq[QueryDef] = Seq(

    // Online NB classification under batch execution: the model
    // trained on the FULL corpus, the first 100 ids replayed as
    // arrivals. Every arrival is in-corpus, so predictions are
    // exactly t_classify_nb's rows for those ids — the oracle is the
    // batch replay restricted, holding the JVM scorer to bit-equality
    // with the column-algebra form.
    QueryDef(
      "w_classify_nb",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val model = buildNbModel(docs, $"doc_id", $"text", $"lang")
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(nbServeOracleFor("documents"))),

    // HASHED-model serving: the model trains in the bucket feature
    // space (t_classify_nb_hashed's chain) and the SAME scorer serves
    // it — arrivals fold each token to its bucket via the JVM hash
    // twin, pinned bit-equal to the column pmod by the shared oracle.
    // This is the pair that proves the serve path accepts either
    // model form.
    QueryDef(
      "w_classify_nb_hashed",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val (cls, cnt) = nbCountFrames(docs, $"text", $"lang",
          featOf = graft.ops.Classify.hashedFeat)
        val model = nbModelFromFrames(cls, cnt,
          Some(graft.ops.Classify.HashedFeatureBuckets))
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${graft.ops.Classify.nbCtesFor("documents",
                graft.ops.Classify.duckdbHashedFeat("u"))}
              SELECT doc_id, lab AS pred_lang,
                     CAST(total AS BIGINT) AS bits_best
              FROM nbr WHERE rk = 1 AND doc_id < 100 ORDER BY doc_id""")),

    // The durable NB-serving cycle: both count frames WRITTEN to
    // parquet and RELOADED before the broadcast model is collected —
    // the scoring job needs zero knowledge of how the model was
    // trained (no tokenize/aggregate subtree; plain parquet scans feed
    // the guard + collects). Strings and exact longs round-trip
    // exactly, so the same oracle covers built and stored forms.
    QueryDef(
      "w_classify_stored",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "nbstore",
          nbStoreSeq.incrementAndGet())
        val (cls, cnt) = nbCountFrames(docs, $"text", $"lang")
        graft.ops.IndexStore.save(root, "nb_classes" -> cls, "nb_counts" -> cnt)
        val model = nbModelFromFrames(
          graft.ops.IndexStore.load(s, root, "nb_classes"),
          graft.ops.IndexStore.load(s, root, "nb_counts"))
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(nbServeOracleFor("documents"))),

    // Model ADD — NB counts are additive with no cross-document terms
    // (the w_lm_add argument): ingesting a batch is one count pass
    // over JUST the batch summed into the stored frames (union +
    // group-sum on both; new tokens and new classes simply appear,
    // and the vocabulary recounts itself) — provably equal to
    // retraining on corpus + batch without rescanning the corpus. The
    // batch is the first 30 docs' 40-char prefixes under shifted ids
    // (the dd_lsh_increment fixture, labels kept), so the oracle is
    // the retrain over the unioned relation.
    QueryDef(
      "w_classify_add",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "nbadd",
          nbStoreSeq.incrementAndGet())
        val (cls, cnt) = nbCountFrames(docs, $"text", $"lang")
        graft.ops.IndexStore.save(root, "nb_classes" -> cls, "nb_counts" -> cnt)
        val batch = docs.filter($"doc_id" < 30)
          .select(($"doc_id" + 2000000L).as("doc_id"), $"lang",
            substring($"text", 1, 40).as("text"))
        val (clsB, cntB) = nbCountFrames(batch, $"text", $"lang")
        val clsLive = graft.ops.IndexStore.load(s, root, "nb_classes")
          .unionByName(clsB)
          .groupBy($"lab").agg(
            sum($"n_docs_s").as("n_docs_s"), sum($"n_toks_s").as("n_toks_s"))
        val cntLive = graft.ops.IndexStore.load(s, root, "nb_counts")
          .unionByName(cntB)
          .groupBy($"w", $"lab").agg(sum($"cws").as("cws"))
        graft.ops.IndexStore.save(root,
          "nb_classes" -> clsLive, "nb_counts" -> cntLive)
        val model = nbModelFromFrames(
          graft.ops.IndexStore.load(s, root, "nb_classes"),
          graft.ops.IndexStore.load(s, root, "nb_counts"))
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(nbServeOracleFor(
        """(SELECT doc_id, lang, text FROM documents
            UNION ALL
            SELECT doc_id + 2000000 AS doc_id, lang,
                   substring(text, 1, 40) AS text
            FROM documents WHERE doc_id < 30)"""))),

    // Model TAKEDOWN — EXACT count-model unlearning by artifact
    // surgery (the w_lm_takedown move): "forget documents 100-199" is
    // ONE count pass over just the tombstoned docs subtracted from
    // both stored frames — (w, lab) rows at zero drop out, classes at
    // zero docs drop out, and the vocabulary recounts itself from the
    // surviving token frame — provably equal to retraining on the
    // corpus minus the tombstones WITHOUT rescanning the surviving
    // corpus. The oracle IS the retrain over the filtered relation;
    // scored docs (< 100) are untombstoned and in-corpus either way.
    QueryDef(
      "w_classify_takedown",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val root = graft.ops.IndexStore.scratchRoot(s, "nbtakedown",
          nbStoreSeq.incrementAndGet())
        val (cls, cnt) = nbCountFrames(docs, $"text", $"lang")
        graft.ops.IndexStore.save(root, "nb_classes" -> cls, "nb_counts" -> cnt)
        val (clsT, cntT) = nbCountFrames(
          docs.filter($"doc_id" >= 100 && $"doc_id" < 200), $"text", $"lang")
        val clsLive = graft.ops.IndexStore.load(s, root, "nb_classes")
          .join(clsT.select($"lab", $"n_docs_s".as("__d"), $"n_toks_s".as("__t")),
            Seq("lab"), "left")
          .select($"lab",
            ($"n_docs_s" - coalesce($"__d", lit(0L))).as("n_docs_s"),
            ($"n_toks_s" - coalesce($"__t", lit(0L))).as("n_toks_s"))
          .filter($"n_docs_s" > 0)
        val cntLive = graft.ops.IndexStore.load(s, root, "nb_counts")
          .join(cntT.select($"w", $"lab", $"cws".as("__c")), Seq("w", "lab"), "left")
          .select($"w", $"lab", ($"cws" - coalesce($"__c", lit(0L))).as("cws"))
          .filter($"cws" > 0)
        // in-place rewrite is safe: save() stages to a temp dir before
        // the atomic rename, so the subtraction reads the old frames
        // in full while writing the new ones
        graft.ops.IndexStore.save(root,
          "nb_classes" -> clsLive, "nb_counts" -> cntLive)
        val model = nbModelFromFrames(
          graft.ops.IndexStore.load(s, root, "nb_classes"),
          graft.ops.IndexStore.load(s, root, "nb_counts"))
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(nbServeOracleFor(
        "(SELECT * FROM documents WHERE doc_id < 100 OR doc_id >= 200)")))
  )
}
