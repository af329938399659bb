package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class XsDoc(doc_id: Long, text: String)

/** Online excess-surprisal scoring as a REAL StreamingQuery: the two
  * frozen broadcast models (pool + target-slice reference) score
  * arriving documents in micro-batches, and the emitted
  * pool/target/excess bits must equal the batch form's rows for the
  * same ids (which the w_select_excess oracle already holds to the
  * shared-count column-algebra replay). */
class StreamExcessSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed excess scores == batch form across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val pool = LmServe.buildLmModel(docs, $"text")
    val target = LmServe.buildLmModel(docs.filter($"lang" === "en"), $"text")
    val rows = docs.select($"doc_id", $"text").as[XsDoc].collect().sortBy(_.doc_id)

    val in = MemoryStream[XsDoc]
    val q = LmServe.withOnlineExcessScore(
        in.toDF(), $"doc_id", $"text", pool, target)
      .writeStream.format("memory").queryName("w_excess_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_bigrams", $"pool_bits", $"target_bits",
          $"excess_bits")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val got = key(spark.table("w_excess_stream"))
      val want = key(LmServe.withOnlineExcessScore(
        docs, $"doc_id", $"text", pool, target))
      assert(want.nonEmpty && got == want)
      // and the batch scorer's excess agrees bitwise with the
      // column-algebra operator's perdoc stage for the same docs
      val alg = graft.ops.LmScore.excessLmSelect(
          docs, $"doc_id", $"text", $"lang" === "en")
        .select($"doc_id", $"n_bigrams", $"pool_bits", $"target_bits",
          $"excess_bits")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      assert(alg == want)
    } finally q.stop()
  }
}
