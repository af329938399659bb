package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DotProduct edge semantics: parity with the built-in
  * aggregate(zip_with(...)) fold on null elements, and analysis-time
  * rejection of wrong input types. */
class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("dotProduct matches the built-in fold, including null elements -> null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](7.0, null)))
      .toDF("id", "a", "b")
    val got = df.select($"id",
      VectorExpressions.dotProduct($"a", $"b").as("fused"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
        .as("builtin"))
      .collect().sortBy(_.getLong(0))
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broken at id=${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(!got(0).isNullAt(1) && got(0).getDouble(1) == 32.0)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
  }

  test("dotProduct on length-mismatched arrays is null, like the built-in fold") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),   // left longer
      (2L, Seq(1.0), Seq(4.0, 5.0, 6.0)),        // right longer
      (3L, Seq(1.0, 2.0), Seq(3.0, 4.0)))        // equal: 11.0
      .toDF("id", "a", "b")
    val got = df.select($"id",
      VectorExpressions.dotProduct($"a", $"b").as("fused"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
        .as("builtin"))
      .collect().sortBy(_.getLong(0))
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broken at id=${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(got(0).isNullAt(1) && got(1).isNullAt(1))
    assert(!got(2).isNullAt(1) && got(2).getDouble(1) == 11.0)
  }

  test("dotProduct on null array input is null") {
    import spark.implicits._
    val df = Seq((Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorExpressions.dotProduct($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("dotProduct rejects non-array<double> inputs at analysis time") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("n", "s")
    val e = intercept[AnalysisException] {
      df.select(VectorExpressions.dotProduct($"n", $"s")).queryExecution.analyzed
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("floatVectorBytes: bytes-equal <=> float-equal under grouping semantics") {
    import spark.implicits._
    // -0.0 collapses onto +0.0 and all NaN payloads canonicalize — the
    // exact equivalence Spark's NormalizeFloatingNumbers establishes
    // before keying on a float array; distinct values stay distinct
    val rows = Seq(
      (1L, Seq(1.5f, 0.0f)),
      (2L, Seq(1.5f, -0.0f)), // same group as 1
      (3L, Seq(Float.NaN, 2.0f)),
      (4L, Seq(java.lang.Float.intBitsToFloat(0x7fc00001), 2.0f)), // NaN payload, same group as 3
      (5L, Seq(1.5f, 0.1f)), // close to 1 but distinct
      (6L, Seq(1.5f))) // prefix of 1 but shorter
    val df = rows.toDF("id", "v")
      .select($"id", VectorExpressions.floatVectorBytes($"v").as("k"))
    val groups = df.groupBy($"k").agg(collect_list($"id").as("ids"))
      .collect().map(_.getSeq[Long](1).sorted.toSeq).sortBy(_.head)
    assert(groups.toSeq == Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L), Seq(6L)))
  }

  test("floatVectorBytes grouping partitions the real embeddings exactly like the raw array") {
    import spark.implicits._
    // twin-doubled corpus: grouping by the binary fingerprint must give
    // the same group structure as grouping by the float array itself
    val e = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.union(e.select($"vec_id" + 1000000L, $"embedding", $"label"))
    val byArray = both.groupBy($"embedding").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    val byBytes = both.groupBy(VectorExpressions.floatVectorBytes($"embedding")).count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(byBytes == byArray)
    assert(byBytes.forall(_ >= 2)) // every vector has its twin
  }

  test("floatVectorBytes: null elements keyed injectively; null array -> null; non-float rejected") {
    import spark.implicits._
    // distinct null-carrying vectors must stay distinct (the earlier
    // null-element -> null-key shortcut merged them, contradicting raw
    // array<float> grouping); equal ones must still collide, and null
    // position matters
    val df = Seq(
      (1L, Option(Seq(Option(1.0f), None))),
      (2L, Option(Seq(Option(2.0f), None))),
      (3L, Option(Seq(Option(1.0f), None))), // same group as 1
      (4L, Option(Seq(None, Option(1.0f)))), // null in a different slot
      (5L, Option.empty[Seq[Option[Float]]])).toDF("id", "v")
    val keyed = df.select($"id", VectorExpressions.floatVectorBytes($"v").as("k"))
    assert(keyed.filter($"id" === 5L).head().isNullAt(1)) // null ARRAY -> null key
    val groups = keyed.filter($"k".isNotNull)
      .groupBy($"k").agg(collect_list($"id").as("ids"))
      .collect().map(_.getSeq[Long](1).sorted.toSeq).sortBy(_.head)
    assert(groups.toSeq == Seq(Seq(1L, 3L), Seq(2L), Seq(4L)))
    // and the key partitions EXACTLY like the raw array under grouping
    val byArray = df.groupBy($"v").count().collect()
      .map(_.getLong(1)).sorted.toSeq
    val byBytes = df.groupBy(VectorExpressions.floatVectorBytes($"v")).count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(byBytes == byArray)
    val bad = Seq((1, Seq(1.0))).toDF("n", "d")
    val ex = intercept[AnalysisException] {
      bad.select(VectorExpressions.floatVectorBytes($"d")).queryExecution.analyzed
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>"))
  }
}
