package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Selection]] — the bucketed two-phase global rank / top-fraction /
  * running-total primitive. Every test pins EXACT equality against the
  * naive unpartitioned-window form on the same data (the
  * decomposition's whole claim is bit-identical results with a
  * partitioned plan), including the adversarial cases: tie-heavy order
  * keys (many rows per bucket), a single hot bucket, negative scores,
  * and weighted prefix sums. */
class SelectionSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.expressions.Window

  // 1000 rows, scores drawn from 20 distinct values (tie-heavy: ~50
  // rows per exact score; bucket = floor(-score * 4) additionally
  // merges ~2 scores per bucket), deterministic via hash mixing
  private def corpus() = {
    import spark.implicits._
    (0L until 1000L).map { i =>
      val score = ((i * 2654435761L) % 20L).toDouble / 4.0 - 2.0
      (i, score)
    }.toDF("id", "score")
  }

  test("withGlobalRank == unpartitioned row_number, desc order with ties") {
    import spark.implicits._
    val df = corpus()
    val got = Selection.withGlobalRank(df,
        floor(-$"score" * 4), Seq($"score".desc, $"id".asc), "rk")
      .select($"id", $"rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bounded-global-window: test-only naive twin on 1000 rows
    val naive = df.withColumn("rk",
        row_number().over(Window.orderBy($"score".desc, $"id".asc)).cast("long"))
      .select($"id", $"rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("withGlobalRank: single hot bucket (constant score) still exact") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, 1.5)).toDF("id", "score")
    val got = Selection.withGlobalRank(df,
        floor(-$"score" * 4), Seq($"score".desc, $"id".asc), "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 500L).forall(i => got(i) == i + 1))
  }

  test("topFracByOrder == unpartitioned-window selection, including the ceil boundary") {
    import spark.implicits._
    val df = corpus()
    for (frac <- Seq(0.1, 0.25, 0.333, 1.0)) {
      val got = Selection.topFracByOrder(df,
          floor(-$"score" * 4), Seq($"score".desc, $"id".asc), frac, "sel")
        .filter($"sel").select($"id").collect().map(_.getLong(0)).toSet
      // bounded-global-window: test-only naive twin on 1000 rows
      val naive = df.withColumn("rk",
          row_number().over(Window.orderBy($"score".desc, $"id".asc)))
        .filter($"rk" <= math.ceil(1000 * frac).toLong)
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(got == naive, s"frac=$frac")
    }
  }

  test("withRunningTotals: weighted exclusive prefix sum + grand total == unpartitioned form") {
    import spark.implicits._
    val df = corpus().withColumn("w", (abs(hash($"id")) % 7 + 1).cast("long"))
    val got = Selection.withRunningTotals(df,
        floor(-$"score" * 4), Seq($"score".desc, $"id".asc), $"w",
        "off", "tot")
      .select($"id", $"off", $"tot").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bounded-global-window: test-only naive twin on 1000 rows
    val naive = df.withColumn("off", coalesce(sum($"w").over(
          Window.orderBy($"score".desc, $"id".asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(df.agg(sum($"w").as("tot"))))
      .select($"id", $"off", $"tot").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive)
  }

  test("input columns pass through unchanged and no helper columns leak") {
    import spark.implicits._
    val df = corpus().withColumn("extra", $"id" * 2)
    val out = Selection.topFracByOrder(df,
      floor(-$"score" * 4), Seq($"score".desc, $"id".asc), 0.5, "sel")
    assert(out.columns.toSeq == Seq("id", "score", "extra", "sel"))
  }
}
