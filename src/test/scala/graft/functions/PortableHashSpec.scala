package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine portability contract: md5Hash60 must produce
  * exactly what DuckDB's `('0x' || substring(md5(s), 1, 15))::BIGINT`
  * produces. The expected values below were captured FROM DuckDB
  * (v1.0), so this spec catches a Spark-side drift (conv/md5 behavior)
  * without needing DuckDB on the test classpath. */
class PortableHashSpec extends AnyFunSuite with SparkSpec {

  test("md5Hash60 matches DuckDB's hex-prefix cast bit-for-bit") {
    import spark.implicits._
    val got = Seq("hello", "7|the quick brown").toDF("s")
      .select(PortableHash.md5Hash60($"s"))
      .collect().map(_.getLong(0)).toSeq
    // captured from DuckDB: SELECT ('0x'||substring(md5(?),1,15))::BIGINT
    assert(got == Seq(419982666956583591L, 200414753545199260L))
  }

  test("universal-hash family: values in [0, p), deterministic, a_i never 0") {
    import spark.implicits._
    (0 until 32).foreach { i =>
      val (a, _) = PortableHash.uhConsts(i)
      assert(a > 0 && a < PortableHash.UH_PRIME, s"a_$i out of range: $a")
    }
    val xs = Seq(0L, 1L, PortableHash.UH_DOMAIN - 1).toDF("x")
    (0 until 4).foreach { i =>
      val vals = xs.select(PortableHash.uhApply(i, $"x")).collect().map(_.getLong(0))
      assert(vals.forall(v => v >= 0 && v < PortableHash.UH_PRIME), vals.toSeq.toString)
    }
  }
}
