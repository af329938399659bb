package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class NbDoc(doc_id: Long, text: String)

/** [[ClassifyServe]] — the frozen-NB online classifier as a REAL
  * StreamingQuery: arrivals classified in micro-batches against the
  * broadcast model must equal the batch scorer's rows AND the
  * column-algebra operator's predictions for the same ids (the JVM
  * bits loop held to bit-equality with the SQL form, same contract as
  * the LM/excess/DSIR twins). */
class StreamClassifySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed NB predictions == batch scorer == column-algebra operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = ClassifyServe.buildNbModel(docs, $"doc_id", $"text", $"lang")
    val rows = docs.select($"doc_id", $"text").as[NbDoc].collect().sortBy(_.doc_id)

    val in = MemoryStream[NbDoc]
    val q = ClassifyServe.withOnlineNbPredict(in.toDF(), $"doc_id", $"text", model)
      .writeStream.format("memory").queryName("w_classify_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"pred_lang", $"bits_best").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val got = key(spark.table("w_classify_stream"))
      val batch = key(ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model))
      assert(got.nonEmpty && got == batch)
      // and both equal the column-algebra operator's (pred, bits)
      val alg = graft.ops.Classify
        .nbPredict(docs, $"doc_id", $"text", $"lang", "lang")
        .select($"doc_id", $"pred_lang", $"bits_best").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(alg == got)
    } finally q.stop()
  }
}
