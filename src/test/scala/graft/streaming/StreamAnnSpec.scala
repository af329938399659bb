package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Vec(vec_id: Long, embedding: Array[Float])

/** Streaming ANN serving: the multi-micro-batch run over the broadcast
  * quantized index emits exactly the batch form's rows, and the ADC
  * ordering agrees with the batch family's s_ann_adc first pass. */
class StreamAnnSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))

  test("streaming ANN across 3 micro-batches == batch run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val idx = AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[Vec].collect().toSeq.sortBy(_.vec_id)
    assert(queries.size == 20)

    val mem = MemoryStream[Vec]
    val q = AnnServe.withOnlineAnn(mem.toDF(), $"vec_id", $"embedding", idx, k = 5)
      .writeStream.format("memory").queryName("wann").outputMode("append").start()
    try {
      queries.grouped(7).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wann").collect().map(key).toSet
      val batched = AnnServe
        .withOnlineAnn(emb.filter($"vec_id" < 20), $"vec_id", $"embedding", idx, k = 5)
        .collect().map(key).toSet
      assert(streamed == batched)
      assert(batched.size == 20 * 5)
    } finally q.stop()
  }

  test("k-bounded heap selection == full-sort selection (ties broken by ascending id)") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val idx = AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding")
    val got = AnnServe
      .withOnlineAnn(emb.filter($"vec_id" < 3), $"vec_id", $"embedding", idx, k = 8)
      .collect()
      .groupBy(_.getLong(0))
    // reference: score everything with the same integer-code math and
    // full-sort
    val codes = idx.entries.map(e => e.id -> e).toMap
    for ((qid, rows) <- got) {
      val q = codes(qid)
      val all = idx.entries.filter(_.id != qid).map { e =>
        val d = q.codes.zip(e.codes).map { case (a, b) => a * b }.sum
        (d / math.sqrt(q.cc * e.cc), e.id)
      }
      val expect = all.sortBy { case (cos, nid) => (-cos, nid) }.take(8)
      val gotSorted = rows.sortBy(_.getInt(1))
        .map(r => (r.getDouble(3), r.getLong(2))).toSeq
      assert(gotSorted == expect.toSeq, s"query $qid")
    }
  }

  test("ADC top-1 agrees with s_ann_adc's first pass on shared queries") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val idx = AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding")
    val wTop1 = AnnServe
      .withOnlineAnn(emb.filter($"vec_id" < 20), $"vec_id", $"embedding", idx, k = 1)
      .select($"query_id", $"neighbor_id", $"cos_adc")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val adc = graft.ops.Similarity.adcTopK(spark, sf, m = 10, k = 5)
      .filter($"adc_rank" === 1)
      .select($"query_id", $"neighbor_id", $"cos_adc")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((qid, (nid, cos)) <- adc)
      assert(wTop1(qid) == ((nid, cos)), s"query $qid")
  }
}
