package graft.streaming

import graft.SparkSpec
import graft.streaming.Cadence._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Per-channel poll cadence (D2) and stall detection (D11) semantics
  * against the reference (bus.py:38-49, daq-3i.py:233-260). */
class CadenceSpec extends AnyFunSuite with SparkSpec {

  test("dueFilter batch: first always due, then strictly-greater-than timing") {
    import spark.implicits._
    val ticks = Seq(
      Tick(1, 0L, 2000L, 10.0),    // first: due (bus.py:42-44)
      Tick(1, 1000L, 2000L, 11.0), // 1000 - 0 = 2000? no: 1000 <= 2000 -> not due
      Tick(1, 2000L, 2000L, 12.0), // 2000 - 0 = 2000, NOT > 2000 -> not due (strict, bus.py:46)
      Tick(1, 3000L, 2000L, 13.0), // 3000 - 0 > 2000 -> due
      Tick(1, 5000L, 2000L, 14.0), // 5000 - 3000 = 2000 -> not due
      Tick(2, 500L, 1000L, 20.0))  // other channel: first -> due
      .toDS()
    val got = Cadence.dueFilter(ticks).collect().sortBy(s => (s.channel_id, s.ts_ms))
    assert(got.map(s => (s.channel_id, s.ts_ms)).toSeq ==
      Seq((1L, 0L), (1L, 3000L), (2L, 500L)))
  }

  test("dueFilter streaming: state carries across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Tick]
    val q = Cadence.dueFilter(mem.toDS())
      .writeStream.format("memory").queryName("due").outputMode("append").start()
    try {
      mem.addData(Tick(1, 0L, 2000L, 1.0)) // due (first)
      q.processAllAvailable()
      mem.addData(Tick(1, 1500L, 2000L, 2.0)) // 1500 <= 2000 since last emit 0 -> filtered
      q.processAllAvailable()
      mem.addData(Tick(1, 2500L, 2000L, 3.0)) // 2500 > 2000 -> due
      q.processAllAvailable()
      val got = spark.table("due").as[DueSample].collect().sortBy(_.ts_ms)
      assert(got.map(_.ts_ms).toSeq == Seq(0L, 2500L))
    } finally q.stop()
  }

  test("stallMonitor: the 6th consecutive overrun emits one stall, then reset (cooloff)") {
    import spark.implicits._
    val over = (1 to 12).map(i => BusTick(1, i * 1000L, 1500L)) // 12 overruns
    val mixed = Seq(BusTick(2, 1000L, 1200L), BusTick(2, 2000L, 800L), // reset
      BusTick(2, 3000L, 1200L), BusTick(2, 4000L, 1200L), BusTick(2, 5000L, 1200L),
      BusTick(2, 6000L, 1200L), BusTick(2, 7000L, 1200L)) // only 5 consecutive after reset
    val got = Cadence.stallMonitor((over ++ mixed).toDS()).collect()
      .sortBy(s => (s.bus_id, s.ts_ms))
    // bus 1: stalls at ticks 6 and 12 (stall_count > BUS_STALL_COUNT,
    // daq-3i.py:256 — the 6th consecutive overrun; counter resets after each).
    // bus 2: 5 consecutive never exceeds the limit -> no stall.
    assert(got.map(s => (s.bus_id, s.ts_ms)).toSeq == Seq((1L, 6000L), (1L, 12000L)))
  }

  test("stallMonitor streaming: counter survives micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[BusTick]
    val q = Cadence.stallMonitor(mem.toDS())
      .writeStream.format("memory").queryName("stall").outputMode("append").start()
    try {
      mem.addData((1 to 3).map(i => BusTick(1, i * 1000L, 2000L)): _*)
      q.processAllAvailable()
      mem.addData((4 to 6).map(i => BusTick(1, i * 1000L, 2000L)): _*)
      q.processAllAvailable()
      val got = spark.table("stall").as[Stall].collect()
      assert(got.map(_.ts_ms).toSeq == Seq(6000L)) // 3 + 3 consecutive -> 6th fires
    } finally q.stop()
  }
}
