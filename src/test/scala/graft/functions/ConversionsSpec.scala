package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conversion-expression compiler semantics vs the reference
  * (conversion.py:7-16): `Value = <arith in x>`, null on bad programs. */
class ConversionsSpec extends AnyFunSuite with SparkSpec {

  private def eval(program: String, x: Double): Option[Option[Double]] = {
    import spark.implicits._
    Conversions.compile(program, lit(x)).map { c =>
      val row = spark.range(1).select(c.as("v")).head()
      if (row.isNullAt(0)) None else Some(row.getDouble(0))
    }
  }

  test("simple scale program (FIXTURES.md seed row: scale10)") {
    assert(eval("Value = x * 10", 5.0).contains(Some(50.0)))
  }

  test("offset program (c2k)") {
    assert(eval("Value = x + 273.15", 20.0).contains(Some(293.15)))
  }

  test("compound arithmetic and whitelisted functions") {
    assert(eval("Value = (x - 32) * 5 / 9", 212.0).contains(Some(100.0)))
    assert(eval("Value = sqrt(abs(x))", -16.0).contains(Some(4.0)))
    assert(eval("Value = round(x * 1.5, 1)", 2.0).contains(Some(3.0)))
  }

  test("missing Value assignment -> no program (conversion.py:10-12)") {
    assert(Conversions.body("x * 10").isEmpty)
    assert(Conversions.body("Result = x * 10").isEmpty)
    assert(eval("x * 10", 5.0).isEmpty)
  }

  test("syntax error -> None (conversion.py:13-15 SyntaxError branch)") {
    assert(eval("Value = not a valid ((program", 5.0).isEmpty)
  }

  test("unknown symbol -> None (conversion.py:13-15 KeyError branch)") {
    assert(eval("Value = y * 2", 5.0).isEmpty)
    assert(eval("Value = x + secret_fn(3)", 5.0).isEmpty)
  }

  test("asteval constants pi/e bind as literals (regression: unbound pi crashed the whole plan)") {
    assert(eval("Value = x * pi", 2.0).contains(Some(2.0 * math.Pi)))
    assert(eval("Value = e + x", 1.0).contains(Some(math.E + 1.0)))
    // and a symbol that is NOT a known constant still nulls only its program
    assert(eval("Value = x * tau", 2.0).isEmpty)
  }

  test("wrong-arity whitelisted function nulls only its program (regression)") {
    import spark.implicits._
    spark.range(1).count() // ensure an active session for probe analysis
    assert(eval("Value = pow(x)", 2.0).isEmpty)    // pow needs 2 args
    assert(eval("Value = pow(x, 2)", 3.0).contains(Some(9.0)))
  }

  test("null input propagates to null output") {
    import spark.implicits._
    val c = Conversions.compile("Value = x * 10", lit(null).cast("double")).get
    assert(spark.range(1).select(c).head().isNullAt(0))
  }

  test("applyConversions compiles one CASE over the conversions dim") {
    import spark.implicits._
    val convs = Seq(
      1L -> "Value = x * 10",
      2L -> "Value = x + 1",
      3L -> "Value = broken ((")
    val df = Seq((0L, 5.0), (1L, 5.0), (2L, 5.0), (3L, 5.0), (9L, 5.0))
      .toDF("conv_id", "x")
      .withColumn("v", Conversions.applyConversions(convs, $"conv_id", $"x"))
      .orderBy($"conv_id")
    val got = df.select($"conv_id", $"v").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    assert(got.toSeq == Seq(
      0L -> Some(5.0),   // no conversion id 0 registered -> passthrough
      1L -> Some(50.0),
      2L -> Some(6.0),
      3L -> None,        // malformed program -> null (conversion.py:13-15)
      9L -> Some(5.0)))  // unmatched id -> passthrough
  }
}
