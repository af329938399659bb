package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class SdVec(vec_id: Long, embedding: Seq[Float])

/** Online SemDeDup (the frozen-quantizer cell index) as a REAL
  * StreamingQuery: the corpus arrives in micro-batches in id order and
  * the survivor set must equal the batch form's — which itself runs
  * under dd_semdedup's oracle — plus the keep-first fixed points on a
  * planted tail. */
class StreamSemDedupSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed survivor set == batch form across micro-batches, twins drop, zero-norm survives") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val cents = NearDup.collectCentroids(graft.ops.Similarity.kmeansCents(
      emb.select($"vec_id", graft.ops.Similarity.asDouble($"embedding").as("v"))))

    // planted tail: a verbatim twin of vec 0 (same cell by the frozen
    // quantizer, cosine 1.0 -> must drop) and a zero-norm vector
    // (scores NaN against everything -> must survive)
    val rows = emb.as[SdVec].collect().sortBy(_.vec_id)
    val twin = SdVec(1000000L, rows.find(_.vec_id == 0L).get.embedding)
    val zero = SdVec(1000001L, Seq.fill(64)(0.0f))
    val all = rows :+ twin :+ zero

    val in = MemoryStream[SdVec]
    val q = NearDup.semDedupOnline(in.toDF(), $"vec_id", $"embedding", cents, 0.4)
      .toDF()
      .writeStream.format("memory").queryName("w_semdd").outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("w_semdd").select($"vec_id", $"cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = NearDup.semDedupOnline(
        all.toSeq.toDF().select($"vec_id", $"embedding"), $"vec_id", $"embedding", cents, 0.4)
        .collect().map(s => s.vec_id -> s.cell).toMap
      assert(want.nonEmpty && got == want)
      assert(!got.contains(1000000L), "verbatim twin survived the cell index")
      assert(got.contains(1000001L), "zero-norm vector was dropped")
      // and the batch form without plants == dd_semdedup's survivor set
      val online = NearDup.semDedupOnline(emb, $"vec_id", $"embedding", cents, 0.4)
        .collect().map(s => s.vec_id -> s.cell).toMap
      val batch = graft.ops.Dedup.semDedupSurvivors(emb)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(online == batch)
    } finally q.stop()
  }
}
