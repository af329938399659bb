package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class MonitoringSpec extends AnyFunSuite with SparkSpec {

  test("listener records batch stats; overrun detection honors the budget") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val monitor = Monitoring.attach(spark, budgetMs = 0L) // everything overruns
    try {
      val mem = MemoryStream[Int]
      val q = mem.toDS().groupByKey(_ % 2).count()
        .writeStream.format("memory").queryName("mon").outputMode("complete").start()
      try {
        mem.addData(1, 2, 3); q.processAllAvailable()
        mem.addData(4, 5); q.processAllAvailable()
      } finally q.stop()
      // listener events are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 15000
      while (monitor.batches.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val bs = monitor.batches
      assert(bs.size >= 2, s"got ${bs.size} batch events")
      assert(bs.map(_.numInputRows).sum == 5)
      assert(monitor.overruns.nonEmpty) // budget 0 -> every batch overruns
      assert(monitor.maxConsecutiveOverruns.values.max >= 2)
    } finally Monitoring.detach(spark, monitor)
  }

  test("slow sink: trigger-duration, overrun, and backlog metrics emitted") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val monitor = Monitoring.attach(spark, budgetMs = 1000L)
    try {
      val mem = MemoryStream[Int]
      @volatile var sleepMs = 0L
      val q = mem.toDS().writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Int], _: Long) =>
          b.collect(); Thread.sleep(sleepMs); ()
        }
        .start()
      try {
        mem.addData(1, 2, 3); q.processAllAvailable() // fast baseline batch
        sleepMs = 2000 // the sink slows down (bus/back-end degradation)
        mem.addData(4, 5, 6); q.processAllAvailable()
      } finally q.stop()
      val deadline = System.currentTimeMillis() + 15000
      while (monitor.batches.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val bs = monitor.batches.filter(_.numInputRows > 0)
      assert(bs.size >= 2, s"got ${bs.size} data batches")
      // the slow batch's trigger duration carries the sink stall
      assert(bs.exists(_.durationMs >= 2000), bs.toString)
      assert(monitor.overruns.nonEmpty) // budget 1000 < 2000
      // backlog signal: rows arrived faster than the slow batch drained
      assert(monitor.backlogged.nonEmpty, bs.toString)
      val h = monitor.health
      assert(h.nonEmpty)
      val worst = h.values.maxBy(_.maxTriggerMs)
      assert(worst.maxTriggerMs >= 2000 && worst.overruns >= 1 &&
        worst.backlogged >= 1 && worst.batches >= 2, h.toString)
    } finally Monitoring.detach(spark, monitor)
  }
}
