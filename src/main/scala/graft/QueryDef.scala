package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a DataFrame program over the test tables plus,
  * when SQL-expressible, the equivalent ANSI SQL the driver replays in
  * DuckDB over the same parquet inputs (the correctness oracle).
  *
  * Determinism contract (SURVEY.md §5): every query that carries an oracle
  * must be a deterministic relation — ties in any top-K / window rank are
  * broken by a unique key, and floating-point aggregates are computed
  * through exact decimal sums so Spark and DuckDB agree bit-for-bit.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Register map form used by the driver contract in [[SparkEntry]]. */
  def toQueryMap(qs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap

  def toOracleMap(qs: Seq[QueryDef]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
