package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class AgedMedia(media_id: Long, kind: String, content: Array[Byte], n_frames: Int, ets: java.sql.Timestamp)

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

  test("AGED composed media: streaming drop set == batch on the retained window, all three kinds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the w_media_aged construction: copies land 10·o seconds behind
    // their originals, horizon 150 s — the unified processor ages all
    // three kind verifies in one state machine
    val base = Multimodal.synthesize(spark, sf).toDF()
    val nat = base
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
    val rep = base.filter($"media_id" < 30)
      .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
      .withColumn("media_id", $"media_id" + 1000000L)
    val corpus = nat.unionByName(rep)
    val aging = Some(NearDup.Aging($"ets", 150000L))
    val batched = NearDup.mediaDroppedByIndex(corpus, aging = aging)
      .toDF().distinct().collect().map(_.getLong(0)).toSet
    // the unified aged state judges exactly what the three standalone
    // AGED pair operators judge
    val perKindAged =
      NearDup.imageNearDupPairs(corpus, maxHamming = 6, aging = aging)
        .collect().map(_.id_b).toSet ++
      NearDup.audioNearDupPairs(corpus, maxHamming = 6, aging = aging)
        .collect().map(_.id_b).toSet ++
      NearDup.videoNearDupPairs(corpus, minShared = 2, aging = aging)
        .collect().map(_.id_b).toSet
    assert(batched == perKindAged)
    // deterministic gap split for the identical-content fingerprint
    // kinds (image/audio verify their original at hamming 0 whenever
    // it is still in horizon; a video copy additionally needs >= 2
    // sampled frames, so its split is covered by the equality above)
    (0L until 30L).filter(_ % 3 != 2).foreach { o =>
      assert(batched.contains(o + 1000000L) == (10 * o <= 150),
        s"copy of $o: gap ${10 * o}s vs horizon 150s") }

    val arrivals = corpus
      .select($"media_id", $"kind", $"content", $"n_frames", $"ets")
      .as[AgedMedia].collect().toSeq.sortBy(a => (a.ets.getTime, a.media_id))
    val mem = MemoryStream[AgedMedia]
    val q = NearDup.mediaDroppedByIndex(
        mem.toDF().withWatermark("ets", "10 seconds"), aging = aging)
      .toDF()
      .writeStream.format("memory").queryName("wmedia_aged")
      .outputMode("append").start()
    try {
      arrivals.grouped(150).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wmedia_aged").collect().map(_.getLong(0)).toSet
      assert(streamed == batched,
        s"stream != batch on the retained window: missing=${batched -- streamed} extra=${streamed -- batched}")
    } finally q.stop()
  }
}
