package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class MixDoc(doc_id: Long, source: String, text: String)

/** [[MixServe]] — the frozen-rate online mixture admission as a REAL
  * StreamingQuery: arrivals thinned in micro-batches against the
  * broadcast rates (a stream-static join — the artifact is a static
  * frame) must equal the batch replay row-for-row, for both the
  * source-keyed and the classified (frozen NB → predicted-domain
  * rate) forms. Both gates must exercise both verdicts. */
class StreamMixSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed w_mix_rebalance admission == batch replay; both verdicts occur") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    // the frozen artifact, built once (exactly the query's batch phase)
    val t = docs.select($"doc_id", $"source",
      size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"))
    val tot = t.groupBy($"source").agg(sum($"nt").as("ts"))
    val rates = tot.crossJoin(broadcast(tot.agg(min($"ts").as("mts"))))
      .withColumn("rate_ppm", expr("mts * 1000000L div ts"))
      .select($"source", $"rate_ppm")

    val in = MemoryStream[MixDoc]
    val admission = in.toDF()
      .withColumn("nt",
        size(graft.ops.TextAnalysis.tokens($"text")).cast("long"))
      .join(broadcast(rates), Seq("source"))
      .withColumn("admitted",
        graft.functions.PortableHash.md5Hash60($"doc_id".cast("string"))
          % 1000000L < $"rate_ppm")
      .select($"doc_id", $"source", $"nt", $"rate_ppm", $"admitted")
    val q = admission.writeStream.format("memory").queryName("wmix_stream")
      .outputMode("append").start()
    try {
      val arrivals = docs.filter($"doc_id" < 100)
        .select($"doc_id", $"source", $"text").as[MixDoc]
        .collect().sortBy(_.doc_id)
      arrivals.grouped(37).foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toMap
      val got = key(spark.table("wmix_stream"))
      val batch = key(graft.SparkEntry.queries("w_mix_rebalance")(spark, sf))
      assert(got.nonEmpty && got == batch)
      assert(got.values.exists(_._4) && got.values.exists(!_._4),
        "admission gate is vacuous on the fixture")
    } finally q.stop()
  }

  private def budgetOf(docs: org.apache.spark.sql.DataFrame): Long = {
    import spark.implicits._
    docs.select(
        org.apache.spark.sql.functions.size(
          graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"),
        $"source")
      .groupBy($"source").agg(sum($"nt").as("ts"))
      .agg(min($"ts")).head().getLong(0)
  }

  private def naiveBudget(
      docs: org.apache.spark.sql.DataFrame,
      budget: Long): Map[Long, (String, Long, Long, Boolean)] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    docs.select($"doc_id", $"source",
        size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"))
      .withColumn("w_before", coalesce(sum($"nt").over(
        Window.partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("admitted", $"w_before" < budget)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
  }

  private def keyedBudget(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("source"), col("nt"), col("w_before"),
      col("admitted")).collect()
    .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toMap

  test("streamed w_mix_budget: per-domain counters continue across micro-batches; domains close for good") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val budget = budgetOf(docs)
    val arr = docs.select($"doc_id", $"source",
        size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"))
      .as[MixArrival].collect().sortBy(_.doc_id)

    val in = MemoryStream[MixArrival]
    val q = MixServe.withOnlineBudget(in.toDF(), budget)
      .toDF()
      .writeStream.format("memory").queryName("wmixb_stream")
      .outputMode("append").start()
    try {
      arr.grouped((arr.length + 3) / 4).foreach { c =>
        in.addData(c.toSeq); q.processAllAvailable()
      }
      val got = keyedBudget(spark.table("wmixb_stream"))
      val want = naiveBudget(docs, budget)
      assert(want.nonEmpty && got == want)
      val batch = keyedBudget(
        graft.SparkEntry.queries("w_mix_budget")(spark, sf))
      assert(batch == want)
      // both verdicts, and every domain admits a non-empty prefix
      assert(got.values.exists(_._4) && got.values.exists(!_._4))
      val perSource = got.values.groupBy(_._1)
      assert(perSource.values.forall(_.exists(_._4)))
      // once closed, closed for good: no admitted arrival after the
      // first rejection within any domain (ids replay in order)
      got.toSeq.sortBy(_._1).groupBy(_._2._1).foreach { case (_, rs) =>
        val flags = rs.map(_._2._4)
        assert(!flags.sliding(2).exists(p => p.length == 2 && !p(0) && p(1)))
      }
    } finally q.stop()
  }

  test("per-domain budget counters on RocksDB: kill/restart mid-stream, admission == batch form") {
    import spark.implicits._
    val rocksCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksCls)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_rocks_mixb").toString
      val (inDir, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
      val docs = graft.model.Tables.table(spark, sf, "documents")
      val budget = budgetOf(docs)
      val rows = docs.select($"doc_id", $"source",
          size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"))
        .as[MixArrival].collect().sortBy(_.doc_id)
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      def land(chunk: Seq[MixArrival]): Unit =
        chunk.toDF().coalesce(1).write.mode("append").parquet(inDir)

      land(chunks(0))
      val schema = spark.read.parquet(inDir).schema
      def start() = MixServe.withOnlineBudget(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir), budget)
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      assert(q1.lastProgress != null && q1.lastProgress.stateOperators.nonEmpty)
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill: the counters live only in the RocksDB checkpoint

      land(chunks(2)) // arrivals while the query is down
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      // recovered counters must CONTINUE (a reset would re-open every
      // closed domain and re-admit the post-restart slice)
      val got = keyedBudget(spark.read.parquet(out))
      val want = naiveBudget(docs, budget)
      assert(got == want,
        s"RocksDB recovery diverged: ${(want.toSet -- got.toSet).take(3)} " +
          s"vs ${(got.toSet -- want.toSet).take(3)}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed w_mix_classified admission (frozen NB + frozen rates) == batch replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = ClassifyServe.buildNbModel(docs, $"doc_id", $"text", $"lang")
    val pred = ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model)
      .select($"doc_id", $"pred_lang")
    val t = docs.select($"doc_id",
        size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("nt"))
      .join(pred, Seq("doc_id"))
    val tot = t.groupBy($"pred_lang").agg(sum($"nt").as("ts"))
    val rates = tot.crossJoin(broadcast(tot.agg(min($"ts").as("mts"))))
      .withColumn("rate_ppm", expr("mts * 1000000L div ts"))
      .select($"pred_lang", $"rate_ppm")

    val in = MemoryStream[MixDoc]
    // per arrival: classify against the frozen model, then admit
    // against the predicted domain's frozen rate — both artifacts
    // static, the whole map stateless
    val admission = ClassifyServe
      .withOnlineNbPredict(in.toDF(), $"doc_id", $"text", model)
      .select($"doc_id", $"pred_lang")
      .join(broadcast(rates), Seq("pred_lang"))
      .withColumn("admitted",
        graft.functions.PortableHash.md5Hash60($"doc_id".cast("string"))
          % 1000000L < $"rate_ppm")
      .select($"doc_id", $"pred_lang", $"rate_ppm", $"admitted")
    val q = admission.writeStream.format("memory").queryName("wmixc_stream")
      .outputMode("append").start()
    try {
      val arrivals = docs.filter($"doc_id" < 100)
        .select($"doc_id", $"source", $"text").as[MixDoc]
        .collect().sortBy(_.doc_id)
      arrivals.grouped(41).foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("wmixc_stream").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      val batch = graft.SparkEntry.queries("w_mix_classified")(spark, sf)
        .select($"doc_id", $"pred_lang", $"rate_ppm", $"admitted").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(got.nonEmpty && got == batch)
      assert(got.values.exists(_._3) && got.values.exists(!_._3),
        "classified admission gate is vacuous on the fixture")
    } finally q.stop()
  }
}
