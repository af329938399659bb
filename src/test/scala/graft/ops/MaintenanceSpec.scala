package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retention / upsert invariants (SURVEY.md §5 item 3). */
class MaintenanceSpec extends AnyFunSuite with SparkSpec {

  private def sampleLog = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      (i.toLong, (rnd.nextInt(10) + 1).toLong, rnd.nextInt(100).toLong, rnd.nextDouble())
    }.toDF("id", "channel_id", "ts", "value")
  }

  test("retainNewest keeps min(count, n) newest rows per key") {
    import spark.implicits._
    val df = sampleLog
    val n = 7
    val kept = Maintenance.retainNewest(df, Seq($"channel_id"), Seq($"ts", $"id"), n)
    val counts = kept.groupBy($"channel_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = df.groupBy($"channel_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.foreach { case (k, c) => assert(counts(k) == math.min(c, n.toLong)) }
    // kept rows are the newest: every kept (ts,id) >= every victim (ts,id) per key
    val victims = Maintenance.victims(df, kept, Seq("id"))
    val minKept = kept.groupBy($"channel_id")
      .agg(min(struct($"ts", $"id")).as("mn"))
    val maxVict = victims.groupBy($"channel_id")
      .agg(max(struct($"ts", $"id")).as("mx"))
    val bad = minKept.join(maxVict, "channel_id")
      .filter($"mx" > $"mn").count()
    assert(bad == 0)
  }

  test("kept and victims partition the input") {
    import spark.implicits._
    val df = sampleLog
    val kept = Maintenance.retainNewest(df, Seq($"channel_id"), Seq($"ts", $"id"), 5)
    val victims = Maintenance.victims(df, kept, Seq("id"))
    assert(kept.count() + victims.count() == df.count())
    assert(kept.select("id").intersect(victims.select("id")).count() == 0)
  }

  test("retention is idempotent") {
    import spark.implicits._
    val df = sampleLog
    val once = Maintenance.retainNewest(df, Seq($"channel_id"), Seq($"ts", $"id"), 5)
    val twice = Maintenance.retainNewest(once, Seq($"channel_id"), Seq($"ts", $"id"), 5)
    assert(once.exceptAll(twice).count() == 0)
    assert(twice.exceptAll(once).count() == 0)
  }

  test("upsert: latest writer wins per key, insert-if-absent (daq_status.py:48-57)") {
    import spark.implicits._
    val current = Seq(("daq-3i", 1, 10L), ("CHL: 1", 1, 10L)).toDF("parameter", "status", "ts")
    val updates = Seq(("CHL: 1", 0, 20L), ("CHL: 2", 1, 15L)).toDF("parameter", "status", "ts")
    val merged = Maintenance.upsert(current, updates, Seq("parameter"), Seq($"ts"))
    val got = merged.orderBy($"parameter").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("CHL: 1", 0, 20L), ("CHL: 2", 1, 15L), ("daq-3i", 1, 10L)))
  }

  test("upsert is idempotent") {
    import spark.implicits._
    val current = Seq(("a", 1, 10L)).toDF("parameter", "status", "ts")
    val updates = Seq(("a", 2, 20L), ("b", 1, 5L)).toDF("parameter", "status", "ts")
    val once = Maintenance.upsert(current, updates, Seq("parameter"), Seq($"ts"))
    val twice = Maintenance.upsert(once, updates, Seq("parameter"), Seq($"ts"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("flush yields the empty relation with the same schema (daq_status.py:19-33)") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("parameter", "status")
    val flushed = Maintenance.flush(df)
    assert(flushed.count() == 0)
    assert(flushed.schema == df.schema)
  }
}
