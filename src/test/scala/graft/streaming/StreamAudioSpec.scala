package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class AgedAud(media_id: Long, kind: String, content: Array[Byte], ets: java.sql.Timestamp)

/** Online audio fingerprint index: micro-batch replay == batch run,
  * and the planted copies pair their originals at hamming 0 — the
  * audio twin of StreamPhashSpec. */
class StreamAudioSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming audio fingerprint across 3 micro-batches == batch run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Multimodal.synthesize(spark, sf).toDF()
    val replayed = base
      .filter($"kind" === "audio" && $"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = base.unionByName(replayed)
    val arrivals = corpus.filter($"kind" === "audio")
      .as[MediaFile].collect().toSeq.sortBy(_.media_id)
    assert(arrivals.exists(_.media_id >= 1000000L))

    val mem = MemoryStream[MediaFile]
    val q = NearDup.audioNearDupPairs(mem.toDF(), maxHamming = 6)
      .writeStream.format("memory").queryName("waudio")
      .outputMode("append").start()
    try {
      arrivals.grouped(60).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("waudio").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batched = NearDup.audioNearDupPairs(corpus, maxHamming = 6)
        .collect().map(p => (p.id_a, p.id_b, p.hamming)).toSet
      assert(streamed == batched)
      // every planted copy pairs its original at hamming 0
      val copies = arrivals.map(_.media_id).filter(_ >= 1000000L)
      copies.foreach { cid =>
        assert(streamed.contains((cid - 1000000L, cid, 0)), s"copy $cid") }
      // and the pair set matches the batch banded-join operator's
      val banded = graft.SparkEntry.queries("mm_audio_pairs")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == banded)
    } finally q.stop()
  }
  test("AGED audio fingerprint: streaming == batch on the retained window; out-of-horizon copies never pair") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the w_audio_aged construction: copies land 10*o seconds behind
    // their originals, horizon 150 s
    val base = Multimodal.synthesize(spark, sf).toDF()
      .filter($"kind" === "audio")
    val nat = base
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
    val rep = base.filter($"media_id" < 30)
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = nat.unionByName(rep)
    val aging = Some(NearDup.Aging($"ets", 150000L))
    val batched = NearDup.audioNearDupPairs(corpus, maxHamming = 6, aging = aging)
      .toDF().distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val copies = base.filter($"media_id" < 30)
      .select($"media_id").as[Long].collect().toSet
    copies.foreach { o =>
      assert(batched.contains((o, o + 1000000L)) == (10 * o <= 150),
        s"copy of $o: gap ${10 * o}s vs horizon 150s") }

    val arrivals = corpus.select($"media_id", $"kind", $"content", $"ets")
      .as[AgedAud].collect().toSeq.sortBy(a => (a.ets.getTime, a.media_id))
    val mem = MemoryStream[AgedAud]
    val q = NearDup.audioNearDupPairs(
        mem.toDF().withWatermark("ets", "10 seconds"),
        maxHamming = 6, aging = aging)
      .toDF()
      .writeStream.format("memory").queryName("waudio_aged")
      .outputMode("append").start()
    try {
      arrivals.grouped(40).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("waudio_aged").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batched,
        s"stream != batch on the retained window: missing=${batched -- streamed} extra=${streamed -- batched}")
    } finally q.stop()
  }
}
