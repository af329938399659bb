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
}
