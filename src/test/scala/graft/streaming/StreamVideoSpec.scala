package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class AgedVid(media_id: Long, kind: String, content: Array[Byte], n_frames: Int, ets: java.sql.Timestamp)

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
  test("AGED video shared-frame index: streaming == batch on the retained window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the w_video_aged construction: copies land 10*o seconds behind
    // their originals, horizon 150 s; a copy pairs its original iff
    // the gap clears the horizon AND >= 2 distinct sampled frames
    val base = Multimodal.synthesize(spark, sf).toDF()
      .filter($"kind" === "video")
    val nat = base
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
    val rep = base.filter($"media_id" < 30)
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = nat.unionByName(rep)
    val aging = Some(NearDup.Aging($"ets", 150000L))
    val batched = NearDup.videoNearDupPairs(corpus, minShared = 2, aging = aging)
      .toDF().distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // gap gate: no surviving pair spans more than the horizon, and the
    // aged set is the gap-filtered subset of the unaged set
    val unaged = NearDup.videoNearDupPairs(corpus, minShared = 2)
      .toDF().distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def ets(id: Long): Long = if (id >= 1000000L) 1000000L + 11 * (id - 1000000L) else 1000000L + id
    // compare UNORDERED (aged orients by ts, unaged by id; a replay's
    // ts interleaves with naturals so a pair may flip orientation)
    def unord(p: Set[(Long, Long)]) =
      p.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(unord(batched) == unord(unaged.filter { case (a, b) =>
      math.abs(ets(b) - ets(a)) <= 150 }), "aged != gap-filtered unaged")
    assert(batched.nonEmpty, "no within-horizon video pair at this sf")

    val arrivals = corpus
      .select($"media_id", $"kind", $"content", $"n_frames", $"ets")
      .as[AgedVid].collect().toSeq.sortBy(a => (a.ets.getTime, a.media_id))
    val mem = MemoryStream[AgedVid]
    val q = NearDup.videoNearDupPairs(
        mem.toDF().withWatermark("ets", "10 seconds"),
        minShared = 2, aging = aging)
      .toDF()
      .writeStream.format("memory").queryName("wvideo_aged")
      .outputMode("append").start()
    try {
      arrivals.grouped(40).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wvideo_aged").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batched,
        s"stream != batch on the retained window: missing=${batched -- streamed} extra=${streamed -- batched}")
    } finally q.stop()
  }
}
