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
