package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's smoke surface: entry() must return rows, and
  * every registered query must have resolvable column names matching
  * its oracle's aliases (the hash-compare sorts columns by name). */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query builds a plan and every oracle key has a query") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("bench floors resource parses and stays in sync with the query set") {
    assert(Bench.floors.nonEmpty, "bench_floors.txt missing or empty")
    assert(Bench.floors.values.forall(_ > 0))
    // every floor must name a live query — a renamed/dropped query whose
    // floor lingers would silently lose its outlier defense partner.
    // "__"-prefixed entries are non-query floors (the box-calibration
    // probe), exempt by convention.
    val stale = Bench.floors.keySet.filterNot(_.startsWith("__")) --
      SparkEntry.queries.keySet
    assert(stale.isEmpty, s"floors for unknown queries: $stale")
  }
}
