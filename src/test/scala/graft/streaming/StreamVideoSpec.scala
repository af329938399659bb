package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online video shared-frame index: micro-batch replay == batch run,
  * and every planted copy pairs its original on ALL its sampled
  * frames. */
class StreamVideoSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming video shared-frame index across 3 micro-batches == batch run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Multimodal.synthesize(spark, sf).toDF()
    val replayed = base
      .filter($"kind" === "video" && $"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = base.unionByName(replayed)
    val arrivals = corpus.filter($"kind" === "video")
      .as[MediaFile].collect().toSeq.sortBy(_.media_id)
    assert(arrivals.exists(_.media_id >= 1000000L))

    val mem = MemoryStream[MediaFile]
    val q = NearDup.videoNearDupPairs(mem.toDF(), minShared = 2)
      .writeStream.format("memory").queryName("wvideo")
      .outputMode("append").start()
    try {
      arrivals.grouped(60).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wvideo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batched = NearDup.videoNearDupPairs(corpus, minShared = 2)
        .collect().map(p => (p.id_a, p.id_b, p.n_shared)).toSet
      assert(streamed == batched)
      // every planted copy with >= 2 sampled frames pairs its original
      // on its full distinct-frame set
      val sizes = NearDup.bandedVideos(corpus).collect()
        .groupBy(_.media_id).map { case (id, rows) => id -> rows.head.fhs.length }
      val copies = arrivals.map(_.media_id).filter(_ >= 1000000L)
        .filter(id => sizes.getOrElse(id, 0) >= 2)
      assert(copies.nonEmpty)
      copies.foreach { cid =>
        assert(streamed.contains((cid - 1000000L, cid, sizes(cid).toLong)),
          s"copy $cid (${sizes(cid)} frames)")
      }
      // and the pair set matches the batch postings-join operator's
      val banded = graft.SparkEntry.queries("mm_video_pairs")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == banded)
    } finally q.stop()
  }
}
