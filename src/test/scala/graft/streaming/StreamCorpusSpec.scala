package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Arrival(doc_id: Long, lang: String, text: String)

/** The online corpus pipeline: micro-batch replay of the SAME composed
  * transform (gates + LM + keep-first index) equals the batch form,
  * and every gate exercises both verdicts on the fixture corpus. */
class StreamCorpusSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming corpus pipeline across 4 micro-batches == batch w_corpus") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")

    val arrivals = docs.select($"doc_id", $"lang", $"text")
      .as[Arrival].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[Arrival]
    // the same composed transform the batch query runs, minus the
    // batch-only anti-join: survivors subtract at the sink
    val dropped = NearDup.droppedByIndex(
      StreamCorpus.gatedArrivals(mem.toDF(), model), $"doc_id", $"text", 0.5)
    val q = dropped.writeStream.format("memory").queryName("wcorpus")
      .outputMode("append").start()
    try {
      arrivals.grouped(130).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamedDropped =
        spark.table("wcorpus").collect().map(_.getLong(0)).toSet

      val gatedBatch = StreamCorpus.gatedArrivals(docs, model)
      val batchDropped = NearDup
        .droppedByIndex(gatedBatch, $"doc_id", $"text", 0.5)
        .collect().map(_.doc_id).toSet
      assert(streamedDropped == batchDropped)

      // sink-side survivor subtraction == the batch query's anti-join
      val gatedIds = gatedBatch.select($"doc_id").collect().map(_.getLong(0)).toSet
      val batchRows = graft.SparkEntry.queries("w_corpus")(spark, sf)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(gatedIds -- streamedDropped == batchRows)

      // every stage is exercised: gates drop, the LM gate drops, the
      // index drops, and survivors remain
      val nDocs = arrivals.size
      assert(gatedIds.nonEmpty && gatedIds.size < nDocs)
      assert(streamedDropped.nonEmpty)
      assert(batchRows.nonEmpty && batchRows.size < gatedIds.size)
    } finally q.stop()
  }

  test("LM gate drops exactly the high-surprisal tail of the gated set") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")
    val gated = StreamCorpus.gatedArrivals(docs, model)
      .select($"doc_id", $"avg_bits").collect()
    assert(gated.forall(_.getDouble(1) <= StreamCorpus.LmGate))
    // rebuild the pre-LM stage: at least one doc sits above the gate
    val red = docs.withColumn("text",
      regexp_replace(
        regexp_replace(
          regexp_replace($"text", graft.ops.Pii.EmailRe, graft.ops.Pii.token("EMAIL")),
          graft.ops.Pii.IpRe, graft.ops.Pii.token("IP")),
        graft.ops.Pii.PhoneRe, graft.ops.Pii.token("PHONE")))
    val scored = LmServe.withLmScoreColumn(
        red.select($"doc_id", $"text"), $"text", model)
      .select($"doc_id", $"avg_bits").collect()
    assert(scored.exists(_.getDouble(1) > StreamCorpus.LmGate))
  }
}
