package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed online media pipeline: one unified band state over all
  * three kinds — micro-batch replay == batch run == the union of the
  * three standalone pair operators' dominated sets. */
class StreamMediaSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming composed media drops across 3 micro-batches == batch == per-kind pair union") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Multimodal.synthesize(spark, sf).toDF()
    val replayed = base.filter($"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = base.unionByName(replayed)
    val arrivals = corpus.as[MediaFile].collect().toSeq.sortBy(_.media_id)

    val mem = MemoryStream[MediaFile]
    val q = NearDup.mediaDroppedByIndex(mem.toDF())
      .writeStream.format("memory").queryName("wmedia")
      .outputMode("append").start()
    try {
      arrivals.grouped(200).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wmedia").collect().map(_.getLong(0)).toSet
      val batched = NearDup.mediaDroppedByIndex(corpus)
        .collect().map(_.media_id).toSet
      assert(streamed == batched)
      // the unified state judges exactly what the three standalone
      // pair operators judge: dominated = later element of any
      // verified pair, per kind
      val perKind =
        NearDup.imageNearDupPairs(corpus, maxHamming = 6)
          .collect().map(_.id_b).toSet ++
        NearDup.audioNearDupPairs(corpus, maxHamming = 6)
          .collect().map(_.id_b).toSet ++
        NearDup.videoNearDupPairs(corpus, minShared = 2)
          .collect().map(_.id_b).toSet
      assert(streamed == perKind)
      // and every replayed twin with band evidence is dropped
      assert(batched.exists(_ >= 1000000L))
    } finally q.stop()
  }
}
