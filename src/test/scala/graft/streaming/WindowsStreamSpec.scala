package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double, user_id: Long)

case class EvId(event_id: Long, ts: java.sql.Timestamp, event_type: String, user_id: Long)

/** Stream == batch equivalence for the window transforms: the same
  * function body produces identical results whether fed a batch
  * DataFrame or a MemoryStream across several micro-batches. */
class WindowsStreamSpec extends AnyFunSuite with SparkSpec {

  private def t(minutes: Int) = new java.sql.Timestamp(minutes * 60000L)

  private val batch1 = Seq(
    Ev(t(1), "click", 1.5, 1), Ev(t(2), "click", 2.5, 1),
    Ev(t(5), "view", 1.0, 2), Ev(t(61), "click", 4.0, 1))
  private val batch2 = Seq(
    Ev(t(62), "view", 3.0, 2), Ev(t(125), "click", 1.0, 3))

  test("tumbling window: streaming (2 micro-batches, complete mode) == batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Windows.tumblingCounts(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("wt").outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("wt")
        .orderBy($"w_start", $"event_type").collect().toSeq
      val batched = Windows.tumblingCounts((batch1 ++ batch2).toDF(), "1 hour")
        .orderBy($"w_start", $"event_type").collect().toSeq
      assert(streamed == batched)
      assert(batched.nonEmpty)
    } finally q.stop()
  }

  test("session window: streaming == batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Windows.sessionStats(mem.toDF(), "5 minutes")
      .writeStream.format("memory").queryName("ws").outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("ws")
        .orderBy($"user_id", $"session_start").collect().toSeq
      val batched = Windows.sessionStats((batch1 ++ batch2).toDF(), "5 minutes")
        .orderBy($"user_id", $"session_start").collect().toSeq
      assert(streamed == batched)
      // events at minute 1,2,5 for user 1 merge into one session (gaps < 5m)
      val u1 = batched.filter(_.getLong(2) == 1L)
      assert(u1.head.getLong(3) == 2L) // minutes 1,2 merge; 61 is separate
    } finally q.stop()
  }

  test("first-per-key dedup: streaming (watermarked state) == batch when arrival follows event time") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val evs1 = Seq(
      EvId(1, t(1), "click", 1), EvId(2, t(2), "click", 1), // dup key, first wins
      EvId(3, t(3), "view", 2))
    val evs2 = Seq(
      EvId(4, t(4), "click", 1), // still a dup within the watermark
      EvId(5, t(6), "view", 3))
    val mem = MemoryStream[EvId]
    val q = Windows.firstPerKeyStream(mem.toDF(), Seq("user_id", "event_type"), "10 minutes")
      .writeStream.format("memory").queryName("wdd").outputMode("append").start()
    try {
      mem.addData(evs1: _*); q.processAllAvailable()
      mem.addData(evs2: _*); q.processAllAvailable()
      val streamed = spark.table("wdd")
        .select($"user_id", $"event_type", $"event_id")
        .orderBy($"user_id", $"event_type").collect().toSeq
      val batched = Windows.firstPerKey((evs1 ++ evs2).toDF(), Seq("user_id", "event_type"))
        .select($"user_id", $"event_type", $"event_id")
        .orderBy($"user_id", $"event_type").collect().toSeq
      assert(streamed == batched)
      assert(streamed.map(_.getLong(2)).toSet == Set(1L, 3L, 5L)) // firsts only
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Windows.tumblingCountsStream(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wl").outputMode("append").start()
    try {
      mem.addData(Ev(t(5), "click", 1.0, 1), Ev(t(30), "click", 1.0, 1))
      q.processAllAvailable()
      // advance event time far past hour 0 + watermark -> hour-0 window closes
      mem.addData(Ev(t(200), "click", 1.0, 1))
      q.processAllAvailable()
      // this event is hours late; its window is closed -> must be dropped
      mem.addData(Ev(t(6), "late", 9.9, 9))
      q.processAllAvailable()
      mem.addData(Ev(t(400), "click", 1.0, 1)) // flush more windows
      q.processAllAvailable()
      val out = spark.table("wl").collect()
      assert(out.exists(r => r.getString(1) == "click" && r.getLong(2) == 2L)) // hour 0 emitted
      assert(!out.exists(_.getString(1) == "late")) // late event dropped
    } finally q.stop()
  }
}
