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

  // grouped form: 1000 rows over 8 hash-derived groups of unequal
  // sizes, same tie-heavy score distribution
  private def grouped() = {
    import spark.implicits._
    (0L until 1000L).map { i =>
      val score = ((i * 2654435761L) % 20L).toDouble / 4.0 - 2.0
      val g = s"g${(i * -7046029254386353131L >>> 61).toInt}"
      (i, g, score)
    }.toDF("id", "grp", "score")
  }

  test("topFracByOrderPerGroup == per-group partitioned row_number, including ceil boundaries") {
    import spark.implicits._
    val df = grouped()
    for (frac <- Seq(0.1, 0.25, 0.5, 1.0)) {
      val got = Selection.topFracByOrderPerGroup(df, $"grp",
          floor(-$"score" * 4), Seq($"score".desc, $"id".asc), frac, "sel")
        .filter($"sel").select($"id").collect().map(_.getLong(0)).toSet
      val naive = df
        .withColumn("rk", row_number().over(
          Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"grp")))
        .filter($"rk" <= ceil($"n" * frac))
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(got == naive, s"frac=$frac")
    }
  }

  test("withRunningTotalsPerGroup: per-group weighted prefix + per-group total == partitioned form") {
    import spark.implicits._
    val df = grouped().withColumn("w", (abs(hash($"id")) % 7 + 1).cast("long"))
    val got = Selection.withRunningTotalsPerGroup(df, $"grp",
        floor(-$"score" * 4), Seq($"score".desc, $"id".asc), $"w",
        "off", "tot")
      .select($"id", $"off", $"tot").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val naive = df
      .withColumn("off", coalesce(sum($"w").over(
        Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum($"w").over(Window.partitionBy($"grp")))
      .select($"id", $"off", $"tot").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive)
  }

  test("grouped form: one group with a single hot bucket stays exact; columns pass through") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b", 1.5))
      .toDF("id", "grp", "score").withColumn("extra", $"id" * 3)
    val out = Selection.topFracByOrderPerGroup(df, $"grp",
      floor(-$"score" * 4), Seq($"score".desc, $"id".asc), 0.25, "sel")
    assert(out.columns.toSeq == Seq("id", "grp", "score", "extra", "sel"))
    // 200 per group, constant score → ids ascend within each parity
    // class; top quarter = the 50 lowest ids of each group
    val sel = out.filter($"sel").select($"id").collect().map(_.getLong(0)).toSet
    assert(sel == (0L until 100L).toSet)
  }
}
