package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class DsDoc(doc_id: Long, text: String)

/** Online DSIR scoring as a REAL StreamingQuery: the frozen broadcast
  * ratio table scores arriving documents in micro-batches, and the
  * emitted weights must equal the batch form's rows for the same ids
  * (which the w_dsir oracle already holds to the column-algebra
  * replay). */
class StreamDsirSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed DSIR weights == batch form across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = graft.ops.Dsir.buildDsirModel(
      docs, $"doc_id", $"text", $"lang" === "en")
    val rows = docs.select($"doc_id", $"text").as[DsDoc].collect().sortBy(_.doc_id)

    val in = MemoryStream[DsDoc]
    val q = graft.ops.Dsir.withOnlineDsirScore(in.toDF(), $"doc_id", $"text", model)
      .writeStream.format("memory").queryName("w_dsir_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("w_dsir_stream")
        .select($"doc_id", $"dsir_sum_bits")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.ops.Dsir.withOnlineDsirScore(
        docs, $"doc_id", $"text", model)
        .select($"doc_id", $"dsir_sum_bits")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }
}
