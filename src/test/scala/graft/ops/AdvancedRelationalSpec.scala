package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedRelationalSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact (HLL++ default rsd)") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"approx $approx vs exact $exact")
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
