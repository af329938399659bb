package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

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
}
