package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class operators: salted two-stage
  * aggregation for skewed keys, and bucketed co-located joins.
  *
  * At 100 TB a handful of hot keys (one chatty channel, one viral
  * document source) can hold an entire stage hostage on one reducer.
  * `saltedAgg` splits each key across `salt` sub-keys for the heavy
  * first stage, then merges the tiny per-salt partials — same result,
  * bounded per-task input. (AQE's skew-join handles the join case at
  * runtime; this handles aggregation, which AQE does not split.)
  */
object Scale {

  /** Per-row salt: derived from the row position, NOT the value — a
    * hot key with a constant value (a stuck sensor) must still spread
    * across all n sub-groups. The salt never affects the result (the
    * merge is exact), only the stage-1 distribution.
    *
    * Determinism constraint: monotonically_increasing_id is stable for
    * rows read directly from a deterministic source (a file scan, as
    * here) but NOT for the output of a shuffle, where a task retry can
    * reassign salts mid-aggregation. Apply saltedAgg straight off the
    * scan, or persist/checkpoint a shuffled input first. */
  def saltColumn(n: Int): Column =
    pmod(monotonically_increasing_id(), lit(n.toLong))

  /** Two-stage salted aggregation: count + decimal-exact sum per key.
    * Stage 1 aggregates (key, salt); stage 2 merges the n partials per
    * key. Result identical to a direct groupBy — verified by the
    * oracle — but the wide shuffle carries at most ~1/n of any hot key
    * per task. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salt: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", saltColumn(salt))
      .groupBy(key.as("key"), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(value.cast("decimal(18,2)")).as("__s"))
    partial
      .groupBy(col("key"))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }

  val queries: Seq[QueryDef] = Seq(
    // Salted aggregation produces bit-identical results to the plain
    // groupBy the oracle runs (decimal partials are order-insensitive).
    QueryDef(
      "q_salted_agg",
      (s, d) => {
        import s.implicits._
        saltedAgg(table(s, d, "events"), $"event_type", $"value", salt = 8)
          .withColumnRenamed("key", "event_type")
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
