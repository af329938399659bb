package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedRelationalSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct contract: exact counts positive, 10% tolerance flag holds") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"exact_parts must be positive: $r")
      assert(r.getBoolean(2), s"HLL estimate drifted beyond 10% of exact: $r")
    }
  }

  test("asofLatestBefore: strictly-earlier semantics with tie on ts") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // purchase at t=10(id 1), error at t=10(id 2): same ts, purchase has
    // smaller id -> counts as earlier. error at t=5(id 0): nothing before.
    val df = Seq(
      (0L, ts(5), "error", 0.0),
      (1L, ts(10), "purchase", 42.0),
      (2L, ts(10), "error", 0.0),
      (3L, ts(20), "purchase", 43.0),
      (4L, ts(21), "error", 0.0)
    ).toDF("event_id", "ts", "event_type", "value").withColumn("user_id", lit(7L))
    val out = AdvancedRelational.asofLatestBefore(df,
        $"user_id", $"ts", $"event_id",
        $"event_type" === "purchase",
        struct($"event_id".as("pid"), $"value".as("pval")))
      .filter($"event_type" === "error")
      .select($"event_id", $"__asof.pid")
      .orderBy($"event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((0L, -1L), (2L, 1L), (4L, 3L)))
  }
}
