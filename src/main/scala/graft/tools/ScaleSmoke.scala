package graft.tools

import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness. Three modes:
  *
  *  - `full <sfDir> <copies> <outJson>` — runs EVERY `SparkEntry.queries`
  *    entry twice, against the base corpus and against a `copies`×
  *    amplified replica of the WHOLE database, and writes per-query
  *    (time@1x, time@Nx, ratio) to `outJson`. The amplified database is
  *    `copies` disjoint, FK-consistent replicas: every fact table's key
  *    columns are shifted per copy so joins land exactly as at 1x, while
  *    the dimension tables (region/nation) stay broadcast-small — which
  *    is precisely the 100 TB shape (facts grow, dims don't). Documents
  *    keep their text across copies, so the dedup family sees a
  *    duplicate-SATURATED corpus — its worst case (candidate volume
  *    would grow copies² if any stage were pairwise-unbounded).
  *    A query whose time grows super-linearly in `copies` (ratio well
  *    above `copies`, beyond fixed-overhead noise) is a scale defect.
  *
  *  - `dedup <sfDir> <copies>` — the round-4 dedup-family saturation
  *    probes (uncollapsed candidate volumes vs the collapsed operators).
  *
  *  - `skew <sfDir> <variants>` — plants a HOT BAND: `variants` distinct
  *    near-identical documents (~20% of the corpus) whose shingle sets
  *    differ by one token, so every LSH band hashes them into the SAME
  *    bucket. The candidate join then has one bucket holding ~20% of all
  *    postings — the adversarial-skew case for the banded equi-joins.
  *    Prints wall time plus the max/median TASK time of the run: AQE's
  *    skew-join split (`spark.sql.adaptive.skewJoin`, on by default)
  *    splits the oversized sort-merge partition across tasks, so the
  *    hot bucket must NOT serialize into one straggler task.
  *
  * Usage: sbt "runMain graft.tools.ScaleSmoke [mode] [sfDir] [n] [out]"
  *
  * Run with the DEFAULT driver heap (no SPARK_DRIVER_MEM override).
  * Measured: oversizing the heap to 40g made warm repeat runs degrade
  * progressively (dd_cluster 3.9s at 8g -> 26s then 106s at 40g) — a
  * huge heap almost never GCs, so everything the ContextCleaner frees
  * only after a driver GC (shuffle state, broadcasts, checkpoint
  * blocks) accumulates without bound. Same reason buildSession sets a
  * short periodic-GC interval.
  */
object ScaleSmoke {

  // shared with Bench/Verify — see Tables.buildLocalSession's doc for
  // why the periodicGC pin and fresh-session discipline live THERE
  private def buildSession(): SparkSession =
    graft.model.Tables.buildLocalSession()

  def main(args: Array[String]): Unit = {
    args.headOption.getOrElse("dedup") match {
      case "full"  => fullSet(args.drop(1))
      // `fulld` = full with DISTINCT-document amplification: each
      // copy's words carry a per-copy prefix, so copies share no
      // shingles and the near-dup pair graph is `copies` disjoint
      // replicas of the 1x graph — the amplification that keeps the
      // dedup family's inherent output LINEAR in copies (verbatim
      // text copies saturate it quadratically: every doc gains
      // C(copies,2) true pairs, which measures output writing, not
      // operator scaling)
      case "fulld" => fullSet(args.drop(1), distinctDocs = true)
      case "amp"   => // materialize an amplified dir for ad-hoc profiling
        val spark = buildSession()
        try amplifyDatabase(spark, args(1), args(3), args(2).toInt)
        finally spark.stop()
      case "ampd"  => // amp with DISTINCT documents (the linear-dedup
        // amplification `fulld` uses) — for core-count scale-out
        // sweeps, where saturated duplicates would measure pair-output
        // writing instead of operator scaling
        val spark = buildSession()
        try amplifyDatabase(spark, args(1), args(3), args(2).toInt,
          distinctDocs = true)
        finally spark.stop()
      case "skew"  => hotBand(args.drop(1))
      case "dedup" => dedupSaturation(args.drop(1))
      case "ann"   => annScale(args.drop(1))
      case "semdedup" => semDedupScale(args.drop(1))
      case "joinskew" => joinSkew(args.drop(1))
      case "dsir"  => dsirScale(args.drop(1))
      case "curate" => curateScale(args.drop(1))
      case "classify" => classifyScale(args.drop(1))
      case "batchshard" => batchShardScale(args.drop(1))
      case "curatepipe" => curatePipeScale(args.drop(1))
      case "classifylife" => classifyLifeScale(args.drop(1))
      case other   => sys.error(s"unknown mode '$other' (full|fulld|dedup|skew|ann|semdedup|joinskew|dsir|curate|classify|batchshard|curatepipe|classifylife)")
    }
  }

  /** `ann <sfDir> <copies> <outJson>` — the scaled-parameter honesty
    * pass on the IVF family: the oracle-pinned queries run nlist = 10
    * (tiny by design — the DuckDB replay unrolls training), but the
    * 100 TB design claim is nlist ≈ √N. This mode amplifies the
    * embeddings table `copies`× (id-shifted, verbatim vectors — the
    * point is shape and cost, not recall, which SimilaritySpec pins at
    * real data scale) and measures the full build+serve ivfTopK at the
    * contract config AND at √N-scale cell counts, with nprobe held to
    * a comparable probed fraction. What must hold for the design claim:
    * the centroid side stays broadcast-small (nlist × dim doubles),
    * the per-round assignment stays one map pass + one tiny aggregate,
    * serving cost FALLS as nlist grows (nprobe/nlist of the corpus is
    * scanned), and no cell degenerates into a straggler (cell-balance
    * stats are emitted alongside). PQ serves from a codebook whose
    * size is m × ksub × dsub — dimension-bound, INDEPENDENT of N — so
    * its honesty number here is just the 100× build+serve time at the
    * contract codebook. */
  /** `dsir <sfDir> <copies> <outJson>` — the 100× pass on t_dsir's
    * bucketed two-phase selection (the round-15 verdict's missing
    * artifact: its predecessor was an unpartitioned global window —
    * a single-task sort of the whole per-doc frame — and this mode
    * exists to show the [[graft.ops.Selection]] rewrite scales).
    * Amplifies documents `copies`× with VERBATIM text (ids shifted):
    * the ratio-model table stays `buckets` rows regardless, feature
    * volume grows linearly, and — the adversarial part — every
    * selection-order bucket now holds `copies` exact-tie rows per 1×
    * doc, the worst tie-density the bucketed rank can see (ties
    * concentrate in the per-bucket LOCAL sorts, which must stay
    * parallel across buckets). What must hold: wall ratio ≲ copies
    * (linear work, no quadratic or single-task stage), no straggler
    * task dominating the run, and the selected fraction still exactly
    * ceil(0.25·n). */
  def dsirScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100DSIR.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_dsamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE dsir: ${copies}x documents at $ampDir")

    def run(dir: String): (Double, Double, Long, Long) = {
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        import spark.implicits._
        spark.range(1000).selectExpr("sum(id)").collect()
        var rows = 0L
        var selected = 0L
        def force(): Double = {
          val t0 = System.nanoTime()
          val out = graft.ops.Dsir.dsirWeights(
            table(spark, dir, "documents"), $"doc_id", $"text",
            $"lang" === "en")
          val agg = out.agg(count(lit(1)),
            sum(when($"selected", 1L).otherwise(0L))).head()
          rows = agg.getLong(0); selected = agg.getLong(1)
          (System.nanoTime() - t0) / 1e9
        }
        force() // codegen warmup
        durations.clear()
        val t = force()
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        println(f"SCALE dsir $dir: $t%.2f s " +
          f"(straggler ${maxTask / math.max(t, 1e-9)}%.2f, rows $rows%d, selected $selected%d)")
        (t, maxTask / math.max(t, 1e-9), rows, selected)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }

    val (t1, st1, rows1, sel1) = run(sfDir)
    val (tN, stN, rowsN, selN) = run(ampDir)
    require(selN == math.ceil(rowsN * 0.25).toLong,
      s"selected $selN != ceil(0.25 * $rowsN) at ${copies}x")
    val json =
      f"""{
  "mode": "dsir_bucketed_selection", "copies": $copies%d,
  "t1": $t1%.3f, "tN": $tN%.3f, "ratio": ${tN / math.max(t1, 1e-9)}%.2f,
  "straggler_1x": $st1%.2f, "straggler_Nx": $stN%.2f,
  "rows_1x": $rows1%d, "rows_Nx": $rowsN%d,
  "selected_1x": $sel1%d, "selected_Nx": $selN%d
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE dsir wrote $outJson")
  }

  /** `curate <sfDir> <copies> <outJson>` — the 100× pass on the
    * round-16 selection/curation additions, all riding the
    * [[graft.ops.Selection]] bucketed two-phase primitive: RHO-style
    * excess selection (t_select_excess — the heaviest: two bigram
    * count models + the bucketed rank), systematic weighted sampling
    * (t_sample_weighted), length-banded batching (t_batch_bylen),
    * curriculum packing (t_pack_curriculum), exact-budget segment
    * packing (t_pack_split — shard tiling require()d at both scales),
    * corpus-relative quality selection (t_select_quality —
    * exact-count selection require()d), and per-domain selection
    * (t_select_bydomain — the GROUPED primitive, every source
    * require()d to select exactly ceil(0.25·its size)). Amplifies
    * documents
    * `copies`× with VERBATIM text (ids shifted) — for the
    * quality/excess-quantized buckets that is the worst tie density
    * (every 1× doc now has `copies` exact-score twins per bucket),
    * and for the count models it multiplies every n-gram count by
    * `copies` at constant vocabulary. What must hold per op: wall
    * ratio ≲ copies, no dominant straggler task, and the semantic
    * invariants (excess selects exactly ceil(0.25·n); the sample
    * stays ≤ m; every batch stays ≤ batchSize). */
  def curateScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100CURATE.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_curamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE curate: ${copies}x documents at $ampDir")

    // per-dir measurement: each op timed on its own forcing aggregate,
    // straggler = max task duration / op wall (same listener protocol
    // as dsirScale)
    def run(dir: String): Map[String, (Double, Double, Long)] = {
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        import spark.implicits._
        spark.range(1000).selectExpr("sum(id)").collect()
        def docs = table(spark, dir, "documents")
        def timeOp(body: => Long): (Double, Double, Long) = {
          body // codegen warmup
          durations.clear()
          val t0 = System.nanoTime()
          val stat = body
          val t = (System.nanoTime() - t0) / 1e9
          val maxTask = { import scala.jdk.CollectionConverters._
            durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
          (t, maxTask / math.max(t, 1e-9), stat)
        }
        val excess = timeOp {
          val a = graft.ops.LmScore.excessLmSelect(
              docs, $"doc_id", $"text", $"lang" === "en")
            .agg(count(lit(1)), sum(when($"selected", 1L).otherwise(0L))).head()
          require(a.getLong(1) == math.ceil(a.getLong(0) * 0.25).toLong,
            s"excess selected ${a.getLong(1)} != ceil(0.25 * ${a.getLong(0)})")
          a.getLong(1)
        }
        val sample = timeOp {
          val a = graft.ops.Curate.systematicSample(docs, $"doc_id", $"text", 200)
            .agg(sum(when($"selected", 1L).otherwise(0L))).head()
          require(a.getLong(0) > 0 && a.getLong(0) <= 200,
            s"sample selected ${a.getLong(0)} not in (0, 200]")
          a.getLong(0)
        }
        val bylen = timeOp {
          val a = graft.ops.Curate.lengthBatches(docs, $"doc_id", $"text")
            .groupBy($"len_band", $"batch").agg(count(lit(1)).as("n"))
            .agg(max($"n"), count(lit(1))).head()
          require(a.getLong(0) <= 32, s"batch of ${a.getLong(0)} > 32")
          a.getLong(1)
        }
        val curr = timeOp {
          graft.ops.TextAnalysis.packShardsCurriculum(
              docs, $"doc_id", $"text", budget = 5000L)
            .agg(count(lit(1)), max($"shard")).head().getLong(0)
        }
        val split = timeOp {
          val a = graft.ops.Curate.packSegments(
              docs, $"doc_id", $"text", budget = 5000L, bucketWidth = 100L)
            .groupBy($"shard").agg(sum($"tok_len").as("n"))
            .agg(count(lit(1)).as("shards"), max($"n").as("mx")).head()
          require(a.getLong(1) <= 5000L, s"shard over budget: ${a.getLong(1)}")
          a.getLong(0)
        }
        val selq = timeOp {
          val q = docs
            .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
            .select($"doc_id",
              graft.ops.TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
          val a = graft.ops.Selection.topFracByOrder(q,
              floor(-$"quality" * lit(1024.0)),
              Seq($"quality".desc, $"doc_id".asc), 0.5, "selected")
            .agg(count(lit(1)), sum(when($"selected", 1L).otherwise(0L))).head()
          require(a.getLong(1) == math.ceil(a.getLong(0) * 0.5).toLong,
            s"selected ${a.getLong(1)} != ceil(0.5 * ${a.getLong(0)})")
          a.getLong(1)
        }
        val seldom = timeOp {
          val q = docs
            .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
            .select($"doc_id", $"source",
              graft.ops.TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
          // exact per-GROUP counts: every source must select exactly
          // ceil(0.25 * its own size) — the grouped primitive's claim
          val bad = graft.ops.Selection.topFracByOrderPerGroup(q, $"source",
              floor(-$"quality" * lit(1024.0)),
              Seq($"quality".desc, $"doc_id".asc), 0.25, "selected")
            .groupBy($"source")
            .agg(count(lit(1)).as("n"),
              sum(when($"selected", 1L).otherwise(0L)).as("sel"))
            .filter($"sel" =!= ceil($"n" * 0.25).cast("long"))
            .count()
          require(bad == 0L, s"$bad sources with sel != ceil(0.25 * n)")
          bad
        }
        Map("excess" -> excess, "sample" -> sample,
          "bylen" -> bylen, "curriculum" -> curr,
          "pack_split" -> split, "select_quality" -> selq,
          "select_bydomain" -> seldom)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }

    val r1 = run(sfDir)
    val rN = run(ampDir)
    val ops = Seq("excess", "sample", "bylen", "curriculum",
      "pack_split", "select_quality", "select_bydomain")
    val body = ops.map { op =>
      val (t1, st1, s1) = r1(op)
      val (tN, stN, sN) = rN(op)
      println(f"SCALE curate $op: $t1%.2f s -> $tN%.2f s " +
        f"(ratio ${tN / math.max(t1, 1e-9)}%.2f, straggler $st1%.2f -> $stN%.2f)")
      f""""$op": {"t1": $t1%.3f, "tN": $tN%.3f, "ratio": ${tN / math.max(t1, 1e-9)}%.2f,
    "straggler_1x": $st1%.2f, "straggler_Nx": $stN%.2f, "stat_1x": $s1%d, "stat_Nx": $sN%d}"""
    }.mkString(",\n  ")
    val json =
      s"""{
  "mode": "curate_selection_family", "copies": $copies,
  $body
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE curate wrote $outJson")
  }

  /** `classify <sfDir> <copies> <outJson>` — the 100× pass on the
    * trained-NB family: t_classify_nb (column-algebra training +
    * scoring, one tokenize lease) and the model-collect + frozen-serve
    * path behind w_classify_nb. Amplifies documents `copies`× with
    * VERBATIM text (ids shifted): every count multiplies by `copies`
    * at CONSTANT vocabulary — the count tables and the broadcast
    * artifact stay the same size, only the scoring pass grows
    * linearly, which is exactly the claim to verify. The class priors
    * are scale-invariant by construction (bits(100a, 100b) =
    * bits(a, b) exactly); per-token bits shift by at most the +1
    * smoothing's dilution, so prediction agreement on the original id
    * slice is REPORTED as a stat (not required — the smoothing shift
    * is real arithmetic, not noise). */
  /** `batchshard <sfDir> <copies> <outJson> <shards>` — the online
    * batcher's throughput ceiling and its sharding relief, measured:
    * the exact-per-band form (`shards = 1`, w_batch_bylen's semantic)
    * numbers each band serially — under batch replay one task drains
    * one band, so wall time is bounded below by the LARGEST band no
    * matter how many cores idle. The sharded form keys state by
    * (band, hash-shard), cutting the serial unit ~1/shards at the cost
    * of per-shard (not per-band) numbering. This probe amplifies
    * documents `copies`×, runs both forms, and emits wall times, the
    * straggler fraction (max task / wall — ~1.0 IS the expected
    * signature of the serial form), the largest serial unit each form
    * drains, and exactness invariants (row conservation; every
    * (band[, shard]) key's max batch == (n-1) div 32; per-band
    * totals identical across forms — sharding must never move a doc
    * across bands). */
  /** `classifylife <sfDir> <copies> <outJson>` — the 100× pass on the
    * NB classifier's OPERATIONAL closure (the round-17 stored/add/
    * takedown + hashed-feature work): on the 1× and the `copies`×
    * (verbatim-copy) corpus, measure the lifecycle costs and check
    * the claims that justify them at 100 TB:
    *
    *  - build + store: the one-time cost (grows with the corpus —
    *    that's fine, it is paid once);
    *  - hashed build: the bucket-bounded artifact — the model's key
    *    count must stay ≤ HashedFeatureBuckets at BOTH scales
    *    (require()d), the property that makes the serving broadcast
    *    safe at any corpus size;
    *  - add: folding a FIXED 30-doc batch into the stored count
    *    frames (union + group-sum + save). The stored frame is
    *    VOCABULARY-sized, not corpus-sized — verbatim copies keep the
    *    vocabulary constant (require()d equal across scales) — so the
    *    edit cost must stay roughly flat while the corpus grows 100×;
    *  - takedown: subtracting FIXED tombstones (docs 100-199) from
    *    the live frames — same flat-cost argument, and the edited
    *    model must be EXACTLY the retrain on (corpus + batch −
    *    tombstones), field-for-field and count-for-count (require()d
    *    at both scales: the additivity proof, executed);
    *  - retrain: the full-rebuild baseline the edits avoid —
    *    `edit_vs_retrain_Nx` is the measured win.
    */
  def classifyLifeScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100CLASSIFYLIFE.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_cllamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE classifylife: ${copies}x documents at $ampDir")

    def modelEq(a: graft.streaming.NbModel, b: graft.streaming.NbModel): Boolean =
      a.classes.sameElements(b.classes) &&
        a.priorBits.sameElements(b.priorBits) &&
        a.dd.sameElements(b.dd) &&
        a.counts.keySet == b.counts.keySet &&
        a.counts.forall { case (w, arr) => arr.sameElements(b.counts(w)) }

    val seq = new java.util.concurrent.atomic.AtomicLong()
    def run(dir: String): (Map[String, Double], Long, Long) = {
      val spark = buildSession()
      try {
        import spark.implicits._
        import graft.streaming.ClassifyServe
        import graft.ops.IndexStore
        spark.range(1000).selectExpr("sum(id)").collect()
        def docs = table(spark, dir, "documents")
        def time[T](body: => T): (Double, T) = {
          val t0 = System.nanoTime(); val r = body
          ((System.nanoTime() - t0) / 1e9, r)
        }
        val root = IndexStore.scratchRoot(spark, "nblife", seq.incrementAndGet())
        val (tBuild, vocab) = time {
          val (cls, cnt) = ClassifyServe.nbCountFrames(docs, $"text", $"lang")
          IndexStore.save(root, "nb_classes" -> cls, "nb_counts" -> cnt)
          ClassifyServe.nbModelFromFrames(
            IndexStore.load(spark, root, "nb_classes"),
            IndexStore.load(spark, root, "nb_counts")).counts.size.toLong
        }
        val (tHash, hkeys) = time {
          val (clsH, cntH) = ClassifyServe.nbCountFrames(docs, $"text", $"lang",
            featOf = graft.ops.Classify.hashedFeat)
          ClassifyServe.nbModelFromFrames(clsH, cntH,
            Some(graft.ops.Classify.HashedFeatureBuckets)).counts.size.toLong
        }
        require(hkeys <= graft.ops.Classify.HashedFeatureBuckets,
          s"hashed model $hkeys keys > bucket bound")
        def batch = docs.filter($"doc_id" < 30)
          .select(($"doc_id" + 2000000L).as("doc_id"), $"lang",
            substring($"text", 1, 40).as("text"))
        val (tAdd, _) = time {
          val (clsB, cntB) = ClassifyServe.nbCountFrames(batch, $"text", $"lang")
          val clsLive = IndexStore.load(spark, root, "nb_classes")
            .unionByName(clsB)
            .groupBy($"lab").agg(
              sum($"n_docs_s").as("n_docs_s"), sum($"n_toks_s").as("n_toks_s"))
          val cntLive = IndexStore.load(spark, root, "nb_counts")
            .unionByName(cntB)
            .groupBy($"w", $"lab").agg(sum($"cws").as("cws"))
          IndexStore.save(root, "nb_classes" -> clsLive, "nb_counts" -> cntLive)
        }
        val (tTake, _) = time {
          val (clsT, cntT) = ClassifyServe.nbCountFrames(
            docs.filter($"doc_id" >= 100 && $"doc_id" < 200), $"text", $"lang")
          val clsLive = IndexStore.load(spark, root, "nb_classes")
            .join(clsT.select($"lab", $"n_docs_s".as("__d"), $"n_toks_s".as("__t")),
              Seq("lab"), "left")
            .select($"lab",
              ($"n_docs_s" - coalesce($"__d", lit(0L))).as("n_docs_s"),
              ($"n_toks_s" - coalesce($"__t", lit(0L))).as("n_toks_s"))
            .filter($"n_docs_s" > 0)
          val cntLive = IndexStore.load(spark, root, "nb_counts")
            .join(cntT.select($"w", $"lab", $"cws".as("__c")), Seq("w", "lab"), "left")
            .select($"w", $"lab", ($"cws" - coalesce($"__c", lit(0L))).as("cws"))
            .filter($"cws" > 0)
          IndexStore.save(root, "nb_classes" -> clsLive, "nb_counts" -> cntLive)
        }
        val (tRetrain, ok) = time {
          val base = docs
            .filter(!($"doc_id" >= 100 && $"doc_id" < 200))
            .select($"doc_id", $"lang", $"text")
            .unionByName(batch.select($"doc_id", $"lang", $"text"))
          val mRe = ClassifyServe.buildNbModel(base, $"doc_id", $"text", $"lang")
          val mEd = ClassifyServe.nbModelFromFrames(
            IndexStore.load(spark, root, "nb_classes"),
            IndexStore.load(spark, root, "nb_counts"))
          modelEq(mEd, mRe)
        }
        require(ok, "edited frames != retrain on corpus + batch - tombstones")
        (Map("build" -> tBuild, "hash_build" -> tHash, "add" -> tAdd,
          "takedown" -> tTake, "retrain" -> tRetrain), vocab, hkeys)
      } finally spark.stop()
    }

    val (m1, v1, h1) = run(sfDir)
    val (mN, vN, hN) = run(ampDir)
    require(v1 == vN,
      s"vocabulary changed under verbatim copies: $v1 -> $vN")
    val body = Seq("build", "hash_build", "add", "takedown", "retrain")
      .map { k =>
        println(f"SCALE classifylife $k: ${m1(k)}%.2f s -> ${mN(k)}%.2f s " +
          f"(ratio ${mN(k) / math.max(m1(k), 1e-9)}%.2f)")
        f""""$k": {"t1": ${m1(k)}%.3f, "tN": ${mN(k)}%.3f, "ratio": ${mN(k) / math.max(m1(k), 1e-9)}%.2f}"""
      }.mkString(",\n  ")
    val json =
      f"""{
  "mode": "classify_lifecycle", "copies": $copies%d,
  $body,
  "vocab": $v1%d, "hashed_keys_1x": $h1%d, "hashed_keys_Nx": $hN%d,
  "edit_vs_retrain_Nx": ${mN("retrain") / math.max(mN("add") + mN("takedown"), 1e-9)}%.2f,
  "model_surgery_exact": true,
  "note": "the structural claims are the scale story here: count frames stay vocabulary-sized (vocab constant under verbatim copies, require()d), the hashed model stays bucket-bounded at both scales, and edited frames equal the retrain EXACTLY at both scales; at this fixture's corpus/vocabulary size every phase is scheduling-overhead-dominated, so ~1.0 ratios under 100x data mean no phase's cost grew with the corpus -- for add/takedown that flatness IS the claim (they scan only the delta + vocabulary-sized frames), while at production scale build/retrain would grow linearly and the edit forms would not"
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE classifylife wrote $outJson")
  }

  def batchShardScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100BATCHSHARD.json")
    val shards = args.drop(3).headOption.map(_.toInt).getOrElse(8)
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_bsamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE batchshard: ${copies}x documents at $ampDir")

    val spark = buildSession()
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        durations.add(te.taskInfo.duration); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      spark.range(1000).selectExpr("sum(id)").collect()
      def docs = table(spark, ampDir, "documents")

      // invariants checked per run, Spark-side (nothing corpus-sized
      // collects): rows in == rows out; each key's max batch ==
      // (count - 1) div 32; per-band doc totals
      def checkAndBands(out: DataFrame, keyCols: Seq[String]): Map[Long, Long] = {
        val perKey = out.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("n"), max(col("batch")).as("mb"))
        val bad = perKey.filter(col("mb") =!= expr("(n - 1) div 32")).count()
        require(bad == 0L, s"$bad keys with max batch != (n-1) div 32")
        out.groupBy($"len_band").agg(count(lit(1)).as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

      def run(sh: Int): (Double, Double, Long, Long, Map[Long, Long]) = {
        def once() = graft.streaming.Batching.withOnlineBatchesSharded(
          docs, $"doc_id", $"text", shards = sh).toDF()
        once().count() // codegen + scan warmup
        durations.clear()
        val t0 = System.nanoTime()
        val rows = once().count()
        val t = (System.nanoTime() - t0) / 1e9
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        val bands = checkAndBands(once(), if (sh == 1) Seq("len_band")
          else Seq("len_band", "shard"))
        val serialUnit = bands.values.max / (if (sh == 1) 1L else sh.toLong)
        (t, maxTask / math.max(t, 1e-9), rows, serialUnit, bands)
      }

      val (t1, st1, rows1, su1, bands1) = run(1)
      val (tS, stS, rowsS, suS, bandsS) = run(shards)
      require(rows1 == rowsS, s"row conservation broke: $rows1 != $rowsS")
      require(bands1 == bandsS,
        "sharding moved documents across bands — band membership must be invariant")
      val json =
        f"""{
  "mode": "batchshard", "copies": $copies%d, "shards": $shards%d,
  "rows": $rows1%d,
  "t_serial": $t1%.3f, "t_sharded": $tS%.3f,
  "speedup": ${t1 / math.max(tS, 1e-9)}%.2f,
  "straggler_serial": $st1%.2f, "straggler_sharded": $stS%.2f,
  "largest_band": ${bands1.values.max}%d,
  "serial_unit_serial": $su1%d, "serial_unit_sharded_approx": $suS%d
}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"SCALE batchshard wrote $outJson")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.stop()
    }
  }

  /** `curatepipe <sfDir> <copies> <outJson>` — the composed curation
    * pipeline (pipe_curate) at 100×: amplifies documents `copies`×
    * with VERBATIM texts under shifted ids (the duplicate-saturated
    * worst case for its dedup stage) and runs the whole five-stage
    * composition at both scales.
    *
    * What is and is NOT scale-invariant here, measured and honest:
    * keep-best ALWAYS returns originals (copy ids shift above every
    * original, quality ties break to the lowest id — checked exactly,
    * `all_originals`), and the per-run structural contracts hold at
    * both scales (segment tiling exact, non-terminal shards at the
    * exact budget, ≤ batchSize docs per batch, ≤ m sampled docs). But
    * the top-half SELECTION CUT is a corpus-relative rank, and a rank
    * cut through a TIED order-key group is inherently not
    * copy-invariant: at 100× every tie multiplies 100×, so
    * `ceil(N/2)` slices the boundary tie group differently, a
    * boundary-sliver of documents swaps in/out, and every downstream
    * running offset shifts — the same semantics-driven boundary
    * behavior w_select_quality documents for its frozen threshold.
    * The artifact therefore reports the output doc-set OVERLAP (must
    * stay high — only the boundary sliver may move) instead of
    * pretending bit-equality. */
  def curatePipeScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100CURATEPIPE.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_cpamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE curatepipe: ${copies}x documents at $ampDir")

    def run(dir: String): (Double, Double, Seq[Seq[Any]], Set[Long]) = {
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        graft.ops.Pipeline.pipeCurate(spark, dir).count() // codegen warmup
        durations.clear()
        val t0 = System.nanoTime()
        val rows = graft.ops.Pipeline.pipeCurate(spark, dir)
          .collect().map(_.toSeq.toSeq).toSeq
        val t = (System.nanoTime() - t0) / 1e9
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        // per-run structural contracts (the PipelineSpec invariants,
        // re-checked at scale): exact tiling, exact non-terminal shard
        // budgets, batch-size bound, sample bound
        val get = (r: Seq[Any], i: Int) => r(i).asInstanceOf[Long]
        // columns: 0=doc_id 4=n_tokens 6=len_band 7=batch 9=shard
        //          10=tok_start 11=tok_len
        rows.groupBy(get(_, 0)).foreach { case (id, rs) =>
          val srt = rs.sortBy(get(_, 9))
          require(srt.map(get(_, 11)).sum == get(srt.head, 4),
            s"doc $id: segment tiling broke")
          require(get(srt.head, 10) == 0L, s"doc $id: first segment offset != 0")
        }
        val byShard = rows.groupBy(get(_, 9))
          .map { case (s0, rs) => s0 -> rs.map(get(_, 11)).sum }
        byShard.filter(_._1 != byShard.keys.max).foreach { case (s0, tot) =>
          require(tot == 2000L, s"shard $s0 holds $tot != budget") }
        rows.groupBy(r => (get(r, 6), get(r, 7))).foreach { case (k, rs) =>
          require(rs.map(get(_, 0)).distinct.length <= 32, s"batch $k overfull") }
        val docIds = rows.map(get(_, 0)).distinct
        require(docIds.length <= 100, s"${docIds.length} sampled docs > m")
        (t, maxTask / math.max(t, 1e-9), rows, docIds.toSet)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }

    // SURVIVOR-set scale invariants (the stage where cross-scale set
    // comparison is meaningful — see Pipeline.curateSurvivors): only
    // the selection-boundary tie sliver may move, and every survivor
    // is an original
    def survivors(dir: String): Set[Long] = {
      val spark = buildSession()
      try graft.ops.Pipeline.curateSurvivors(spark, dir)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      finally spark.stop()
    }
    val surv1 = survivors(sfDir)
    val survN = survivors(ampDir)
    require(survN.forall(_ < off), "an amplified copy survived keep-best")
    val survOverlap = (surv1 & survN).size.toDouble / (surv1 | survN).size
    require(survOverlap >= 0.98,
      f"survivor-set overlap $survOverlap%.4f < 0.98 — more than the " +
        "selection boundary tie-sliver moved")

    val (t1, st1, rows1, ids1) = run(sfDir)
    val (tN, stN, rowsN, idsN) = run(ampDir)
    require(rows1.nonEmpty, "curation pipeline emitted nothing at 1x")
    // copies NEVER reach the curated output either
    val allOriginals = idsN.forall(_ < off)
    require(allOriginals, "an amplified copy reached the curated output")
    val sampOverlap = (ids1 & idsN).size.toDouble /
      math.max((ids1 | idsN).size, 1)
    val json =
      f"""{
  "mode": "curate_pipe", "copies": $copies%d,
  "t1": $t1%.3f, "tN": $tN%.3f, "ratio": ${tN / math.max(t1, 1e-9)}%.2f,
  "straggler_1x": $st1%.2f, "straggler_Nx": $stN%.2f,
  "rows_1x": ${rows1.length}%d, "rows_Nx": ${rowsN.length}%d,
  "survivors_1x": ${surv1.size}%d, "survivors_Nx": ${survN.size}%d,
  "survivor_overlap": $survOverlap%.4f,
  "all_originals": $allOriginals%b,
  "sampled_docs_1x": ${ids1.size}%d, "sampled_docs_Nx": ${idsN.size}%d,
  "sampled_overlap_informational": $sampOverlap%.4f,
  "note": "structural contracts exact at both scales (tiling, shard budget, batch size, sample bound); survivor set invariant up to the selection-boundary tie sliver; the systematic sample downstream is deliberately input-sensitive (interval crossings over cumulative sums), so its cross-scale overlap is reported, not gated"
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE curatepipe wrote $outJson")
  }

  def classifyScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100CLASSIFY.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_clamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/documents.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "doc_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/documents.parquet")
      } finally s.stop()
    }
    println(s"SCALE classify: ${copies}x documents at $ampDir")

    def run(dir: String): (Double, Double, Long, Map[Long, String], Double, Long) = {
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        import spark.implicits._
        spark.range(1000).selectExpr("sum(id)").collect()
        def docs = table(spark, dir, "documents")
        def batchRun(): (Long, Map[Long, String]) = {
          val out = graft.ops.Classify.nbPredict(
            docs, $"doc_id", $"text", $"lang", "lang")
          val preds = out.filter($"doc_id" < off)
            .select($"doc_id", $"pred_lang").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          (out.count(), preds)
        }
        batchRun() // codegen warmup
        durations.clear()
        var t0 = System.nanoTime()
        val (rows, preds) = batchRun()
        val tBatch = (System.nanoTime() - t0) / 1e9
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        // the frozen-serve path: collect the model, score the 1x slice
        t0 = System.nanoTime()
        val model = graft.streaming.ClassifyServe.buildNbModel(
          docs, $"doc_id", $"text", $"lang")
        val served = graft.streaming.ClassifyServe.withOnlineNbPredict(
          docs.filter($"doc_id" < off), $"doc_id", $"text", model).count()
        val tServe = (System.nanoTime() - t0) / 1e9
        (tBatch, maxTask / math.max(tBatch, 1e-9), rows, preds, tServe, served)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }

    val (t1, st1, rows1, p1, ts1, sv1) = run(sfDir)
    val (tN, stN, rowsN, pN, tsN, svN) = run(ampDir)
    require(rowsN == rows1 * copies,
      s"classified $rowsN != $rows1 * $copies (verbatim copies all carry tokens alike)")
    require(sv1 == svN, s"served slice changed: $sv1 != $svN")
    val agree = p1.count { case (id, p) => pN.get(id).contains(p) }
    val json =
      f"""{
  "mode": "classify_nb", "copies": $copies%d,
  "t1": $t1%.3f, "tN": $tN%.3f, "ratio": ${tN / math.max(t1, 1e-9)}%.2f,
  "straggler_1x": $st1%.2f, "straggler_Nx": $stN%.2f,
  "rows_1x": $rows1%d, "rows_Nx": $rowsN%d,
  "serve_t1": $ts1%.3f, "serve_tN": $tsN%.3f,
  "serve_ratio": ${tsN / math.max(ts1, 1e-9)}%.2f,
  "pred_agreement_on_1x_ids": ${agree.toDouble / math.max(p1.size, 1)}%.4f
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE classify wrote $outJson")
  }

  /** `semdedup <sfDir> <copies> <outJson>` — the scaled-parameter
    * honesty pass on dd_semdedup, mirroring [[annScale]]: the
    * oracle-pinned query runs nlist = 10, but SemDeDup's whole scaling
    * argument is that the within-cluster quadratic stays bounded
    * because nlist grows with the corpus (cells stay ~N/nlist sized).
    * Amplifies embeddings `copies`× (id-shifted verbatim vectors — a
    * duplicate-SATURATED corpus: every copy pair is cosine 1.0, the
    * family's worst case) and measures the full cluster+prune at
    * √N-scale cell counts, emitting wall, straggler fraction, cell
    * balance, and the survivor count (which must stay ≈ the 1×
    * survivor set: the 99 extra copies of every vector are dominated
    * by their lowest-copy twin — within-cell recall of exact dups is
    * total because identical vectors share a cell by construction). */
  def semDedupScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100SEMDEDUP.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_sdamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/embeddings.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "vec_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/embeddings.parquet")
      } finally s.stop()
    }
    println(s"SCALE semdedup: ${copies}x embeddings at $ampDir")

    def run(dir: String, nlist: Int): (Double, Double, Long) = {
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        var survivors = 0L
        def force(): Double = {
          val t0 = System.nanoTime()
          val out = graft.ops.Dedup.semDedupSurvivors(
            table(spark, dir, "embeddings"), nlist = nlist)
          survivors = out.count()
          (System.nanoTime() - t0) / 1e9
        }
        force() // codegen warmup
        durations.clear()
        val t = force()
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        println(f"SCALE semdedup nlist=$nlist%d: $t%.2f s " +
          f"(straggler ${maxTask / math.max(t, 1e-9)}%.2f, survivors $survivors%d)")
        (t, maxTask / math.max(t, 1e-9), survivors)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }

    val (t1, _, surv1) = run(sfDir, graft.ops.Similarity.IvfNlist)
    val cfgs = Seq(256, 1024).map { nlist =>
      val (tN, st, survN) = run(ampDir, nlist)
      (nlist, tN, st, survN)
    }
    val cfgJson = cfgs.map { case (nl, t, st, sv) =>
      f"""    {"nlist": $nl%d, "tN": $t%.3f, "ratio": ${t / math.max(t1, 1e-9)}%.2f, "straggler": $st%.2f, "survivors": $sv%d}"""
    }.mkString("[\n", ",\n", "\n  ]")
    val json =
      s"""{
  "mode": "semdedup_scaled_params", "copies": $copies,
  "t1": ${f"$t1%.3f"}, "survivors_1x": $surv1,
  "configs": $cfgJson
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE semdedup wrote $outJson")
  }

  /** `joinskew <sfDir> <copies> <outJson>` — the adversarial-skew
    * witness for the stream-stream-join batch twins: the events table
    * is amplified `copies`× and ~20% of ALL rows are reassigned to ONE
    * hot user (md5-bucket selection, so the plant is deterministic),
    * then the purchase<-click interval join runs over it. user_id is
    * the join key, so the hot user is one shuffle partition holding
    * 20% of both sides AND a quadratic share of the output — exactly
    * the shape AQE's skew-join split must break across tasks. The
    * artifact records wall, the max-task/wall straggler fraction, and
    * the hot user's share of the output. */
  def joinSkew(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(2).headOption.getOrElse("SKEW_JOIN_r15.json")
    val hotUser = 999999999L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_jskew").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val ev = s.read.parquet(s"$sfDir/events.parquet")
        val amp = ev.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(
            ($"event_id" + $"__copy" * lit(1000000000L)).as("event_id"),
            $"ts", $"event_type",
            // ~20% of rows -> the hot user; the rest keep per-copy
            // disjoint user spaces (joins land exactly as at 1x)
            when(conv(substring(md5(($"event_id" + $"__copy" * lit(1000000000L))
              .cast("string")), 1, 4), 16, 10).cast("int") % 100 < 20, lit(hotUser))
              .otherwise($"user_id" + $"__copy" * lit(1000000L)).as("user_id"),
            $"value", $"props")
        amp.repartition(32).write.mode("overwrite").parquet(s"$ampDir/events.parquet")
      } finally s.stop()
    }
    println(s"SCALE joinskew: ${copies}x events, 20% on one user, at $ampDir")
    val spark = buildSession()
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        durations.add(te.taskInfo.duration); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      spark.range(1000).selectExpr("sum(id)").collect()
      val ev = table(spark, ampDir, "events")
      def measure(tag: String,
          join: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
            String) => org.apache.spark.sql.DataFrame): (Double, Double, Long, Long) = {
        def joined = join(
          graft.streaming.Windows.purchaseSide(ev),
          graft.streaming.Windows.clickSide(ev), "24 hours")
        joined.write.format("noop").mode("overwrite").save() // codegen warmup
        durations.clear()
        val t0 = System.nanoTime()
        val agg = joined.agg(count(lit(1)),
          sum(when($"user_id" === hotUser, 1L).otherwise(0L))).head()
        val t = (System.nanoTime() - t0) / 1e9
        val (rows, hotRows) = (agg.getLong(0), agg.getLong(1))
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        val straggler = maxTask / math.max(t, 1e-9)
        println(f"SCALE joinskew[$tag]: $t%.2f s, straggler $straggler%.2f, " +
          f"rows $rows%d (hot ${100.0 * hotRows / math.max(rows, 1)}%.1f%%)")
        (t, straggler, rows, hotRows)
      }
      val (tp, sp, rp, hp) = measure("plain",
        graft.streaming.Windows.purchaseClickJoin(_, _, _))
      val (tb, sb, rb, hb) = measure("bucketed",
        graft.streaming.Windows.purchaseClickJoinBucketed(_, _, _))
      require(rp == rb && hp == hb,
        s"bucketed rewrite changed the output: plain ($rp, $hp) vs bucketed ($rb, $hb)")
      val json = f"""{
  "mode": "join_hot_user", "copies": $copies%d, "hot_frac": 0.2,
  "rows": $rp%d, "hot_rows": $hp%d,
  "plain":    {"t": $tp%.3f, "straggler": $sp%.2f},
  "bucketed": {"t": $tb%.3f, "straggler": $sb%.2f}
}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"SCALE joinskew wrote $outJson")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.stop()
    }
  }

  def annScale(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(2).headOption.getOrElse("SCALE100ANN_r10.json")
    val off = 1000000000L
    val ampDir = java.nio.file.Files.createTempDirectory("graft_annamp").toString
    locally {
      val s = buildSession()
      try {
        import s.implicits._
        val df = s.read.parquet(s"$sfDir/embeddings.parquet")
        df.crossJoin(s.range(copies).select($"id".as("__copy")))
          .select(df.schema.fields.toSeq.map { f =>
            if (f.name == "vec_id")
              (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
            else col(f.name)
          }: _*)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$ampDir/embeddings.parquet")
      } finally s.stop()
    }
    val n = copies * 2000L // recorded, not load-bearing
    println(s"SCALE ann: ${copies}x embeddings at $ampDir")

    // (nlist, nprobe): contract config, then √N-scale cells at a
    // comparable-or-smaller probed fraction
    val configs = Seq(
      (graft.ops.Similarity.IvfNlist, 2), (64, 8), (256, 16))
    val rows = configs.map { case (nlist, nprobe) =>
      val spark = buildSession()
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        def force(): Double = {
          val t0 = System.nanoTime()
          noopForce(graft.ops.Similarity.ivfTopK(spark, ampDir, nprobe, 5,
            cells => graft.ops.Similarity.kmeansCells(cells, nlist = nlist)))
          (System.nanoTime() - t0) / 1e9
        }
        force() // warmup (codegen JIT; the build itself re-runs per force)
        durations.clear()
        val t = force()
        val maxTask = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
        // cell balance of the trained assignment at this nlist
        val emb = table(spark, ampDir, "embeddings")
          .select(col("vec_id"),
            graft.ops.Similarity.asDouble(col("embedding")).as("v"))
        val stats = graft.ops.Similarity.kmeansCells(emb, nlist = nlist)
          .groupBy(col("cell")).agg(count(lit(1)).as("m"))
          .agg(count(lit(1)), max(col("m")), avg(col("m"))).head()
        val (cells, mx, mean) =
          (stats.getLong(0), stats.getLong(1), stats.getDouble(2))
        println(f"SCALE ann nlist=$nlist%d nprobe=$nprobe%d: $t%.2f s " +
          f"(straggler ${maxTask / math.max(t, 1e-9)}%.2f, cells $cells%d, " +
          f"max/mean ${mx / math.max(mean, 1e-9)}%.2f)")
        (nlist, nprobe, t, maxTask / math.max(t, 1e-9), cells, mx, mean)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.stop()
      }
    }
    // PQ at the contract codebook on the same amplified corpus
    val pqT = {
      val spark = buildSession()
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        def force(): Double = {
          val t0 = System.nanoTime()
          noopForce(graft.ops.ProductQuant.pqTopK(spark, ampDir, m = 10, k = 5))
          (System.nanoTime() - t0) / 1e9
        }
        force(); val t = force()
        println(f"SCALE ann pq: $t%.2f s"); t
      } finally spark.stop()
    }
    val cfgJson = rows.map { case (nl, np, t, st, cells, mx, mean) =>
      f"""    {"nlist": $nl%d, "nprobe": $np%d, "t": $t%.3f, "straggler": $st%.2f, "cells": $cells%d, "max_cell": $mx%d, "mean_cell": $mean%.1f}"""
    }.mkString("[\n", ",\n", "\n  ]")
    val json =
      s"""{
  "mode": "ann_scaled_params", "copies": $copies, "n_vectors": $n,
  "configs": $cfgJson,
  "pq_contract_t": $pqT
}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SCALE ann wrote $outJson")
  }

  /** Key columns shifted per copy so each replica is FK-consistent and
    * disjoint from the others. Dims (region, nation) are NOT amplified:
    * at 100 TB dimensions stay broadcast-small while facts grow. */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Per-copy seeded permutation of the printable non-space alphabet
    * (33..126), copy 0 = identity — applied as one chained
    * `translate` CASE over the copy column. Deterministic, injective
    * per copy, and space-preserving, so every within-copy structural
    * property (token boundaries, lengths, gram equality, dup graph)
    * is exactly what the un-permuted copy had. */
  private def copyPermutedText(text: org.apache.spark.sql.Column,
      copy: org.apache.spark.sql.Column, copies: Int): org.apache.spark.sql.Column = {
    val from = (33 to 126).map(_.toChar).mkString
    (2 until copies).foldLeft(
      when(copy === 1, translate(text, from, permTo(1)))) { (acc, c) =>
      acc.when(copy === c, translate(text, from, permTo(c)))
    }.otherwise(text) // copy 0: identity
  }

  private def permTo(c: Int): String = {
    val rng = new scala.util.Random(c * 7919L + 13L)
    rng.shuffle((33 to 126).map(_.toChar).toVector).mkString
  }

  /** Amplify the whole database into `outDir`: `copies` id-shifted,
    * FK-consistent replicas of every fact table; dims copied verbatim.
    * Raw parquet in/out (no `table()` ts normalization) so the
    * amplified dir is schema-identical to the driver's. */
  def amplifyDatabase(spark: SparkSession, sfDir: String, outDir: String,
      copies: Int, distinctDocs: Boolean = false): Unit = {
    import spark.implicits._
    val off = 1000000000L
    graft.model.Tables.driverTables.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = shiftCols.get(t) match {
        case None => df // broadcast dim: unchanged
        case Some(keys) =>
          val shifted = df
            .crossJoin(spark.range(copies).select($"id".as("__copy")))
            .select(df.schema.fields.toSeq.map { f =>
              if (keys.contains(f.name))
                (col(f.name) + $"__copy" * lit(off)).cast(f.dataType).as(f.name)
              else col(f.name)
            } :+ col("__copy"): _*)
          val transformed =
            if (distinctDocs && t == "documents")
              // per-copy word prefix: copy c's "quick brown" becomes
              // "c<c>_quick c<c>_brown" — every shingle/gram/token is
              // copy-local, so cross-copy similarity is exactly zero
              // and the pair graph is `copies` disjoint 1x replicas
              // (copy 0 is prefixed too: all copies see identical
              // per-token work, so tN/t1 still compares like to like
              // up to the constant prefix cost).
              // THEN a per-copy pseudorandom permutation of the
              // non-space printable alphabet (space fixed, so token
              // boundaries and all length/gram structure survive;
              // injective per copy, so within-copy dup structure is
              // untouched): the prefix alone is PERCEPTUALLY invisible
              // — copies 0-9 differ only in one digit per word, and a
              // digit-for-digit substitution flips almost no dHash
              // order comparison, so corresponding frames of the same
              // base doc matched across copies at hamming <= 6
              // (measured: 53k of 155k cross-copy frame matches at 4
              // copies were same-base-doc; the permutation cuts them
              // to 2k). Copy 0 keeps the identity permutation.
              shifted
                .withColumn("text", regexp_replace($"text",
                  lit("(\\S+)"), concat(lit("c"), $"__copy", lit("_$1"))))
                .withColumn("text", copyPermutedText($"text", $"__copy", copies))
                .withColumn("n_chars", length($"text").cast("long"))
            else shifted
          transformed.drop("__copy")
      }
      // write fact replicas across many files: a real 100x corpus
      // arrives as thousands of splits, and a single-file table read
      // as ONE scan partition serializes every per-row map chain into
      // one task (measured: w_corpus straggler 0.95 at copies=100 —
      // the harness, not the operator, was the bottleneck)
      val parts = if (shiftCols.contains(t)) 32 else 1
      out.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  private def noopForce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Whole-query-set 1x vs Nx proof run → JSON. Optional 4th arg: a
    * comma-separated query subset (e.g. the aggregate family at
    * copies=100, where amplifying and sweeping all 69 queries would
    * dominate the run for four data points). */
  def fullSet(args: Array[String], distinctDocs: Boolean = false): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(2).headOption.getOrElse("SCALE_r05.json")
    val subset: Seq[String] =
      args.drop(3).headOption.toSeq.flatMap(_.split(",")).map(_.trim)
    val ampDir = java.nio.file.Files.createTempDirectory("graft_amp").toString
    val ampSession = buildSession()
    try {
      amplifyDatabase(ampSession, sfDir, ampDir, copies, distinctDocs)
      ampSession.stop()
      println(s"SCALE amplified ${copies}x database at $ampDir" +
        (if (distinctDocs) " (distinct documents)" else ""))

      // Each sweep gets a FRESH SparkSession (the amplify writes and the
      // other sweep contribute zero session state — broadcast blocks,
      // checkpoint blocks, shuffle tracking — to the measurement; a
      // shared session measurably distorted repeat runs). Per query:
      // one untimed warmup (whole-stage-codegen JIT compiles on first
      // execution — identical plan at both scales, so neither side may
      // pay it in the ratio), then the MEDIAN of three timed runs —
      // a 130-execution local sweep shows sporadic multi-second stalls
      // (GC / cleaner / IO), and a single sample let one stall print a
      // 90x "ratio" that in-isolation reruns put at ~4x.
      // Per query: (median of 3, straggler fraction = max task time /
      // wall of the LAST timed run, error). The straggler fraction is
      // the skew witness the 100x artifacts need: if a banded join
      // serialized its hot bucket into one task, max-task/wall ≈ 1.
      def sweep(dir: String, only: Seq[String] = Nil): Map[String, (Double, Double, Long, Option[String])] = {
        val spark = buildSession()
        val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            durations.add(te.taskInfo.duration); ()
          }
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          // one-time session costs outside all timed runs (same as Bench)
          spark.range(1000).selectExpr("sum(id)").collect()
          table(spark, dir, "region").count()
          val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
          (if (only.isEmpty) qs else qs.filter(q => only.contains(q._1)))
            .map { case (name, fn) =>
              val r =
                try {
                  noopForce(fn(spark, dir))
                  // output-row count, outside every timed sample (and
                  // before the straggler window opens at i == 3): the
                  // artifact's scaling story needs rows_1x vs rows_Nx —
                  // a ratio over 10x reads very differently when the
                  // true output itself grew 100x
                  val rows = fn(spark, dir).count()
                  val samples = (1 to 3).map { i =>
                    if (i == 3) durations.clear()
                    val t0 = System.nanoTime()
                    noopForce(fn(spark, dir))
                    (System.nanoTime() - t0) / 1e9
                  }
                  val lastWall = samples.last
                  val maxTask = { import scala.jdk.CollectionConverters._
                    durations.iterator().asScala.foldLeft(0L)(math.max) / 1e3 }
                  (samples.sorted.apply(1),
                    if (lastWall > 0) maxTask / lastWall else 0.0,
                    rows, Option.empty[String])
                } catch {
                  case e: Throwable =>
                    (Double.NaN, 0.0, -1L, Some(e.getClass.getSimpleName))
                }
              println(f"SCALE $dir%s $name%s: ${r._1}%.2f s (straggler ${r._2}%.2f, rows ${r._3})${r._4.fold("")(" ERR " + _)}")
              name -> r
            }.toMap
        } finally {
          spark.sparkContext.removeSparkListener(listener)
          spark.stop()
        }
      }

      val base = sweep(sfDir, subset)
      val amp = sweep(ampDir, subset)
      val names = base.keys.toSeq.sorted
      def ratioOf(n: String): Double = {
        val (t1, tn) = (base(n)._1, amp(n)._1)
        if (!t1.isNaN && !tn.isNaN && t1 > 0) tn / t1 else -1.0
      }
      def straggler(n: String): Double = amp(n)._2
      // Queries whose sweep ratio exceeds 10 are re-measured ALONE in a
      // fresh session: the 130-execution sweep measures queries under
      // shared-session memory pressure (storage blocks, shuffle state,
      // page-cache churn from every prior query), which inflates a few
      // window-heavy queries well past their plan-inherent scaling —
      // e.g. q_rolling_range timed 31s mid-sweep but 3.0s isolated on
      // the same amplified data. Both numbers are reported; the
      // isolated one is the plan's own scaling.
      val over = names.filter(n => ratioOf(n) > 10)
      if (over.nonEmpty) println(s"SCALE isolated recheck: ${over.mkString(", ")}")
      // one fresh session PER flagged query: a recheck session shared
      // across flagged queries re-accumulates the very pressure it
      // exists to exclude (measured: a query stable at 2s alone timed
      // 23s when rechecked downstream of another flagged query)
      val iso = over.map(n => n -> sweep(ampDir, Seq(n)).apply(n)).toMap
      val entries = names.map { n =>
        val (t1raw, _, rows1, e1) = base(n)
        val (tnraw, frac, rowsN, en) = amp(n)
        val (t1, tn) = (if (t1raw.isNaN) -1.0 else t1raw, if (tnraw.isNaN) -1.0 else tnraw)
        val ratio = if (t1 > 0 && tn >= 0) tn / t1 else -1.0
        val rowsRatio = if (rows1 > 0 && rowsN >= 0) rowsN.toDouble / rows1 else -1.0
        val isoPart = iso.get(n).filterNot(_._1.isNaN).fold("") { case (ti, fi, _, _) =>
          f""", "tN_iso": $ti%.3f, "ratio_iso": ${if (t1 > 0) ti / t1 else -1.0}%.2f, "straggler_iso": $fi%.2f"""
        }
        f"""    "$n": {"t1": $t1%.3f, "tN": $tn%.3f, "ratio": $ratio%.2f, "straggler_N": $frac%.2f, "rows_1x": $rows1, "rows_Nx": $rowsN, "rows_ratio": $rowsRatio%.2f""" + isoPart +
          (e1.orElse(en).fold("")(e => s""", "err": "$e"""")) + "}"
      }
      val t1Total = base.values.map(_._1).filterNot(_.isNaN).sum
      val tnTotal = amp.values.map(_._1).filterNot(_.isNaN).sum
      val json =
        f"""{
  "copies": $copies,
  "sf": "$sfDir",
  "total_t1": $t1Total%.1f,
  "total_tN": $tnTotal%.1f,
  "total_ratio": ${tnTotal / t1Total}%.2f,
  "failed": ${(base.values ++ amp.values).count(_._4.isDefined)},
  "queries": {
${entries.mkString(",\n")}
  }
}
"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
        json.getBytes("UTF-8"))
      println(s"SCALE wrote $outJson (total ${f"$t1Total%.1f"} s @1x -> ${f"$tnTotal%.1f"} s @${copies}x)")
    } finally {
      val p = new org.apache.hadoop.fs.Path(ampDir)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      ()
    }
  }

  /** Hot-band skew stress for the banded dedup joins (see object doc). */
  def hotBand(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = args.drop(1).headOption.map(_.toInt).getOrElse(2500)
    val spark = buildSession()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    try {
      val base = table(spark, sfDir, "documents")
      val n = base.count()
      // background: 2 id-shifted copies (duplicate-saturated baseline)
      val bg = base
        .crossJoin(spark.range(2).select($"id".as("__copy")))
        .select(($"doc_id" + $"__copy" * lit(1000000L)).as("doc_id"),
          $"text", $"lang", $"source", $"n_chars")
      // hot band: `variants` DISTINCT texts sharing ~all shingles — one
      // appended unique token each, so exact-content collapse can NOT
      // absorb them (all contents distinct) and every minhash band
      // funnels them into the same bucket
      val seedText = base.orderBy($"doc_id").select($"text").head().getString(0)
      val hot = spark.range(variants).select(
        ($"id" + lit(500000000L)).as("doc_id"),
        concat(lit(seedText), lit(" varianttok"), $"id").as("text"),
        lit("en").as("lang"), lit("hot").as("source"),
        (length(lit(seedText)) + lit(12)).cast("long").as("n_chars"))
      bg.unionByName(hot).write.parquet(s"$dir/documents.parquet")
      // embedding twin of the text hot band: `variants` DISTINCT
      // vectors around one seed, each perturbed on coordinate 0 by a
      // different tiny step — exact-vector collapse cannot absorb them
      // (all distinct), yet the perturbation is far too small to flip
      // a hyperplane sign, so every LSH band hashes them into the SAME
      // bucket: the adversarial case for dd_embed_cos / s_ann_lsh's
      // banded blocking
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val nE = emb.count()
      val ebg = emb
        .crossJoin(spark.range(2).select($"id".as("__copy")))
        .select(($"vec_id" + $"__copy" * lit(1000000L)).as("vec_id"),
          $"embedding", $"label")
      val seedVec = emb.orderBy($"vec_id").select($"embedding")
        .head().getSeq[Float](0)
      val hotE = spark.range(variants).select(
        ($"id" + lit(500000000L)).as("vec_id"),
        array((lit(seedVec.head) + ($"id" + 1L).cast("float") * lit(1e-6f))
            .cast("float") +: seedVec.tail.map(f => lit(f)): _*).as("embedding"),
        lit(999).cast("int").as("label")) // label is int32 in the driver schema
      ebg.unionByName(hotE).write.parquet(s"$dir/embeddings.parquet")
      val total = n * 2 + variants
      println(s"SKEW corpus: $total docs, hot band = $variants distinct near-identical texts (${100 * variants / total}%)")
      println(s"SKEW embeddings: ${nE * 2 + variants} vectors, hot bucket = $variants distinct near-identical vectors")

      // task-level skew metrics: if the hot bucket serialized into one
      // task, max task time ≈ whole-stage time; AQE's skew-join split
      // (adaptive.skewJoin, default on) plus the pair-bound verify keep
      // max/median bounded instead
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.add(te.taskInfo.duration); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      def measure(name: String)(rowsOf: => Long): Unit = {
        durations.clear()
        val t0 = System.nanoTime()
        val nRows = rowsOf
        val wall = (System.nanoTime() - t0) / 1e9
        val ds = { import scala.jdk.CollectionConverters._
          durations.iterator().asScala.toArray.sorted }
        val maxT = if (ds.nonEmpty) ds.last / 1e3 else 0.0
        val medT = if (ds.nonEmpty) ds(ds.length / 2) / 1e3 else 0.0
        println(f"SKEW $name%s: $wall%.1f s wall, $nRows rows, ${ds.length} tasks, max task $maxT%.1f s, median $medT%.2f s, max/wall ${maxT / wall}%.2f")
      }
      try {
        // The two online indexes (w_neardup_pairs, w_embed_neardup)
        // are EXPECTED to show max/wall near 1 here: a hot band is one
        // flatMapGroupsWithState group, and stateful groups cannot be
        // AQE-split — the serial verify inside the group is the
        // inherent cost of an ONLINE per-band index under a true-dup
        // flood (every emitted pair is true output; production bounds
        // it with maxPerBand). The batch family's banded JOINS are the
        // ones that must stay under the straggler bound.
        // dd_dup_ngrams: the hot band makes every seed gram's document
        // frequency ≈ variants, so the postings back-join concentrates
        // `variants` rows per gram hash — the viral-gram case its
        // scaladoc promises AQE handles
        // dd_containment under the hot band: every hot doc's prefix
        // ends with one shared seed gram, so the candidate join
        // surfaces ALL ~variants² true containment pairs — the
        // inherent quadratic output of containment on a
        // duplicate-saturated corpus, like the other pair queries
        for (q <- Seq("dd_minhash_lsh", "dd_apply_lsh", "dd_simhash",
            "dd_embed_cos", "s_ann_lsh", "dd_decontaminate",
            "dd_embed_decontaminate", "dd_dup_ngrams", "dd_dup_spans",
            "dd_containment", "w_neardup_pairs", "w_embed_neardup")) {
          measure(q)(graft.SparkEntry.queries(q)(spark, dir).count())
        }
        // Incremental-admission worst case: a HOT-BAND BATCH arriving
        // against the hot-band corpus. Every batch doc/vector is a
        // fresh distinct variant of the SAME seed, so all of its band
        // postings land in the bucket that already holds `variants`
        // corpus postings — the candCorpus equi-join concentrates
        // |batch| × |variants| candidate rows into ONE bucket per band
        // (plus the |batch|² candBatch self-join in the same bucket).
        // The joins are plain equi-joins, so AQE's skew split must
        // keep them off a single straggler task — the property the
        // frozen-index admission path needs under a true-dup flood.
        val nBatch = math.max(variants / 5, 100)
        val hotDocBatch = spark.range(nBatch).select(
          ($"id" + lit(700000000L)).as("doc_id"),
          concat(lit(seedText), lit(" battok"), $"id").as("text"))
        measure("dd_lsh_increment(hot-batch)")(
          graft.ops.Dedup.lshIncrementSurvivors(
            table(spark, dir, "documents").select($"doc_id", $"text"),
            hotDocBatch).count())
        // embedding twin: half-integer perturbation steps interleave
        // with the corpus hot bucket's integer steps — all 2500 + 500
        // vectors distinct, all in one hyperplane bucket
        val hotEmbBatch = spark.range(nBatch).select(
          ($"id" + lit(700000000L)).as("vec_id"),
          array((lit(seedVec.head) +
              (($"id".cast("double") + lit(0.5)) * lit(1e-6)).cast("float"))
              .cast("float") +: seedVec.tail.map(f => lit(f)): _*).as("embedding"))
        measure("dd_embed_increment(hot-batch)")(
          graft.ops.Dedup.embedIncrementSurvivors(
            spark.read.parquet(s"$dir/embeddings.parquet"),
            hotEmbBatch).count())
        // Takedown/compact under the hot band: the tombstone set is
        // ~20% of the corpus, HALF drawn from the hot band (every
        // other hot variant) and half from the background copies. The
        // IndexStore.compact rewrite is a broadcast anti-join on
        // UNIQUE ids — no join-key skew is possible there by
        // construction — so the skew stress lands on what follows:
        // band postings REBUILT over the half-emptied hot bucket, and
        // the hot-batch admission joins against it. Those are the
        // same plain equi-joins AQE must keep off a straggler.
        val hotTombDocs = spark.range(variants / 2)
          .select(($"id" * 2 + lit(500000000L)).as("id"))
          .unionByName(spark.range(n / 10).select($"id"))
        measure("dd_lsh_takedown(hot-tombstones)")(
          graft.ops.Dedup.lshTakedownSurvivors(
            table(spark, dir, "documents").select($"doc_id", $"text"),
            hotDocBatch, hotTombDocs).count())
        val hotTombVecs = spark.range(variants / 2)
          .select(($"id" * 2 + lit(500000000L)).as("vec_id"))
          .unionByName(spark.range(nE / 10).select($"id".as("vec_id")))
        measure("dd_embed_takedown(hot-tombstones)")(
          graft.ops.Dedup.embedTakedownSurvivors(
            spark.read.parquet(s"$dir/embeddings.parquet"),
            hotEmbBatch, hotTombVecs).count())
        // the quantized-index compact queries over the hot-bucket
        // corpus: tombstoned cells fold into the artifact while the
        // hot bucket concentrates assignment/probe keys
        measure("s_ann_ivf_compact")(
          graft.SparkEntry.queries("s_ann_ivf_compact")(spark, dir).count())
        measure("s_ann_ivfpq_compact")(
          graft.SparkEntry.queries("s_ann_ivfpq_compact")(spark, dir).count())
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      spark.stop()
    }
  }

  /** Round-4 dedup-family saturation probes: amplifies the sf0.1 corpus
    * `copies` times (each copy keeps the text, shifts doc_id), producing
    * a duplicate-SATURATED corpus — every document gains C(copies, 2)
    * true near-dup partners, the worst case for pairwise stages (df per
    * gram multiplies by `copies`, so a quadratic intermediate would blow
    * up copies² ≈ 400x while the corpus only grows 20x). */
  def dedupSaturation(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = buildSession()
    import spark.implicits._

    val base = table(spark, sfDir, "documents")
    val n = base.count()
    val big = base
      .crossJoin(spark.range(copies).select($"id".as("__copy")))
      .select(
        ($"doc_id" + $"__copy" * lit(1000000L)).as("doc_id"),
        $"text", $"lang", $"source", $"n_chars")
    val bigDir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    big.write.parquet(s"$bigDir/documents.parquet")
    // duplicate-saturated embeddings too: every vector has copies-1
    // exact twins, the worst case for the banded-LSH blocking (twins
    // collide in EVERY band)
    table(spark, sfDir, "embeddings")
      .crossJoin(spark.range(copies).select($"id".as("__copy")))
      .select(
        ($"vec_id" + $"__copy" * lit(1000000L)).as("vec_id"),
        $"embedding", $"label")
      .write.parquet(s"$bigDir/embeddings.parquet")
    println(s"SMOKE corpus: ${n * copies} docs ($copies copies of $n)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SMOKE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    try {
      time("dd_exact")(graft.SparkEntry.queries("dd_exact")(spark, bigDir).count())
      // UNCOLLAPSED prefix-filter probe: candidate volume is pair-bound
      // (stop-grams fall out of prefixes — not sum-of-df^2-bound), but
      // on this saturated corpus "pair-bound" is still quadratic in the
      // duplication factor (~49M candidates for ~1.05M true pairs)
      time("dd_apply_prefix_candidates") {
        val docs = table(spark, bigDir, "documents")
        graft.ops.Dedup.prefixCandidates(docs.select($"doc_id", $"text"))._2.count()
      }
      // the full operator collapses exact-content groups to their
      // minimal doc_id BEFORE pairing, so the pairwise stage sees the
      // 5k unique contents, not the 100k docs: 342s -> ~6s here with a
      // provably identical survivor set
      time("dd_apply")(graft.SparkEntry.queries("dd_apply")(spark, bigDir).count())
      // ngram candidate volume under saturation, uncollapsed probe: the
      // banded prefix filter at t=0.2 keeps this pair-bound (prefix
      // collisions within adjacent bands), not Σ df²-bound — the
      // pre-round-4 full-postings join would square the gram df here
      time("dd_ngram_prefix_candidates") {
        val docs = table(spark, bigDir, "documents")
        graft.ops.Dedup.prefixCandidates(
          docs.select($"doc_id", $"text",
            floor($"n_chars" / lit(50)).cast("int").as("band")),
          tn = 1, td = 5, hashKind = "xx64", banded = true)._2.count()
      }
      time("dd_minhash_lsh")(graft.SparkEntry.queries("dd_minhash_lsh")(spark, bigDir).count())
      time("dd_ngram_jaccard")(graft.SparkEntry.queries("dd_ngram_jaccard")(spark, bigDir).count())
      time("dd_apply_lsh")(graft.SparkEntry.queries("dd_apply_lsh")(spark, bigDir).count())
      time("dd_simhash")(graft.SparkEntry.queries("dd_simhash")(spark, bigDir).count())
      // banded hyperplane-LSH blocking under total vector saturation;
      // output is the inherent quadratic (every twin pair is a true
      // cosine-1 pair), candidates stay band-bounded
      time("dd_embed_cos")(graft.SparkEntry.queries("dd_embed_cos")(spark, bigDir).count())
      time("s_ann_lsh")(graft.SparkEntry.queries("s_ann_lsh")(spark, bigDir).count())
      time("t_vocab")(graft.SparkEntry.queries("t_vocab")(spark, bigDir).count())
      time("t_fingerprint")(graft.SparkEntry.queries("t_fingerprint")(spark, bigDir).count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(bigDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      spark.stop()
    }
  }
}
