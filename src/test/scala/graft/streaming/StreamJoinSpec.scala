package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (engine-added streaming capability):
  * purchases enriched with the error events that follow within 10
  * minutes, watermarks bounding both sides' state. */
class StreamJoinSpec extends AnyFunSuite with SparkSpec {

  private def t(minutes: Int) = new java.sql.Timestamp(minutes * 60000L)

  test("watermarked interval join across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    val p = purchases.toDF()
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
      .withWatermark("p_ts", "30 minutes")
    val e = errors.toDF()
      .select($"user_id".as("e_user"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "30 minutes")
    val joined = p.join(e,
      $"user_id" === $"e_user" &&
        $"e_ts" >= $"p_ts" && $"e_ts" <= $"p_ts" + expr("interval 10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      purchases.addData(Ev(t(10), "purchase", 100.0, 1), Ev(t(10), "purchase", 50.0, 2))
      errors.addData(Ev(t(15), "error", 0.0, 1)) // within 10m of user 1's purchase
      q.processAllAvailable()
      errors.addData(Ev(t(40), "error", 0.0, 2)) // 30m after user 2's purchase: outside
      q.processAllAvailable()
      val got = spark.table("ssj").select($"user_id", $"p_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 100.0)))
    } finally q.stop()
  }

  test("purchaseClickJoinStream == batch twin on the real events table, across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val rows = graft.model.Tables.table(spark, sf, "events")
      .select($"event_id", $"ts", $"event_type", $"user_id").as[EvId]
      .collect().sortBy(_.ts.getTime)
    // event-time-ordered halves: the second micro-batch's purchases
    // must still find first-batch clicks in the join state (the 48h
    // lateness keeps every click within 24h of a future purchase
    // alive across the boundary)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val purchases = MemoryStream[EvId]
    val clicks = MemoryStream[EvId]
    val joined = Windows.purchaseClickJoinStream(
      purchases.toDF(), clicks.toDF(), "24 hours", "48 hours")
    val q = joined.writeStream.format("memory").queryName("ssj_real")
      .outputMode("append").start()
    try {
      purchases.addData(h1.toSeq); clicks.addData(h1.toSeq); q.processAllAvailable()
      purchases.addData(h2.toSeq); clicks.addData(h2.toSeq); q.processAllAvailable()
      val got = spark.table("ssj_real").select($"purchase_id", $"click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = graft.model.Tables.table(spark, sf, "events")
      val want = Windows.purchaseClickJoin(
        Windows.purchaseSide(ev), Windows.clickSide(ev), "24 hours")
        .select($"purchase_id", $"click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "empty batch twin — the fixture lost its matches")
      assert(got == want)
    } finally q.stop()
  }

  test("left-outer interval join defers the null row until the watermark closes the window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[EvId]
    val clicks = MemoryStream[EvId]
    // 10-minute window, 30-minute lateness (matches the inner test's
    // scale so the watermark arithmetic below stays readable)
    val joined = Windows.purchaseClickJoinStream(
      purchases.toDF().select($"event_id", $"ts", $"event_type", $"user_id"),
      clicks.toDF().select($"event_id", $"ts", $"event_type", $"user_id"),
      "10 minutes", "30 minutes", "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    def rows() = spark.table("ssj_outer")
      .select($"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    try {
      // P1 (user 1, t=10) has no click; watermark 0 -> nothing may emit
      purchases.addData(EvId(101L, t(10), "purchase", 1L))
      clicks.addData(EvId(201L, t(5), "click", 2L)) // other user, seeds the click watermark
      q.processAllAvailable()
      assert(rows().isEmpty, "outer row emitted before the watermark closed its window")
      // advance BOTH watermarks past t=10 (min(120, 120) - 30 = 90 > 10):
      // no click with c_ts <= 10 can still arrive, so P1's null row is due
      purchases.addData(EvId(102L, t(120), "purchase", 3L))
      clicks.addData(EvId(202L, t(120), "click", 3L))
      q.processAllAvailable()
      // one more batch so the new watermark is APPLIED to stored state
      purchases.addData(EvId(103L, t(150), "purchase", 4L))
      clicks.addData(EvId(203L, t(150), "click", 4L))
      q.processAllAvailable()
      assert(rows().contains((101L, -1L)),
        "clickless purchase never emitted its outer null row")
      assert(rows().contains((102L, 202L)), "matched pair missing")
    } finally q.stop()
  }

  test("left-outer stream == batch twin on the real events table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val rows = graft.model.Tables.table(spark, sf, "events")
      .select($"event_id", $"ts", $"event_type", $"user_id").as[EvId]
      .collect().sortBy(_.ts.getTime)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val purchases = MemoryStream[EvId]
    val clicks = MemoryStream[EvId]
    val joined = Windows.purchaseClickJoinStream(
      purchases.toDF(), clicks.toDF(), "24 hours", "48 hours", "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer_real")
      .outputMode("append").start()
    try {
      purchases.addData(h1.toSeq); clicks.addData(h1.toSeq); q.processAllAvailable()
      purchases.addData(h2.toSeq); clicks.addData(h2.toSeq); q.processAllAvailable()
      // close every window: a far-future sentinel on each side that
      // SURVIVES the event-type shaping (the watermark operator sits
      // after purchaseSide/clickSide's filter, so a filtered row would
      // advance nothing), then one more batch so the advanced
      // watermark is applied to stored state; sentinel user 999
      // matches no real row and its own output is excluded below
      val far = new java.sql.Timestamp(rows.last.ts.getTime + 80L * 3600 * 1000)
      purchases.addData(EvId(999901L, far, "purchase", 999L))
      clicks.addData(EvId(999901L, far, "click", 999L))
      q.processAllAvailable()
      purchases.addData(EvId(999902L, far, "purchase", 999L))
      clicks.addData(EvId(999902L, far, "click", 999L))
      q.processAllAvailable()
      val got = spark.table("ssj_outer_real").select($"purchase_id", $"click_id")
        .filter($"purchase_id" < 999900L)
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val ev = graft.model.Tables.table(spark, sf, "events")
      val want = Windows.purchaseClickJoin(
        Windows.purchaseSide(ev), Windows.clickSide(ev), "24 hours", "left_outer")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(want.exists(_._2 == -1L), "fixture has no clickless purchase — weak test")
      assert(got == want)
    } finally q.stop()
  }
}
