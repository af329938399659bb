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
}
