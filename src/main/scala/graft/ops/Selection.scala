package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide order statistics WITHOUT an unpartitioned window — the
  * reusable form of the two-phase bucketed decomposition
  * [[TextAnalysis.packShardsByCount]] introduced for token offsets,
  * generalized from prefix sums to global ranks and top-fraction
  * selection (DSIR selection today; any quality-threshold,
  * importance-sampled, or curriculum-ordered selection operator
  * composes the same way).
  *
  * The naive plan for "rank every row of the corpus by X" is
  * `row_number() OVER (ORDER BY X)` — which Spark executes as an
  * `Exchange SinglePartition` followed by one task sorting the WHOLE
  * corpus: fine at sf0.01, a guaranteed straggler-then-OOM at 100 TB.
  * The decomposition here:
  *
  *  - the caller supplies a `bucket` expression that is monotone
  *    NON-DECREASING along the requested total order (rows earlier in
  *    the order never carry a larger bucket) and coarse enough that
  *    the distinct-bucket count is bounded by the VALUE RANGE of the
  *    order key, not the corpus (e.g. `floor(-avg_bits * 256)` for a
  *    score measured in integer bits per feature: at most a few tens
  *    of thousands of buckets no matter how many rows);
  *  - phase 1 aggregates per-bucket weight totals — one
  *    map-side-combined hash aggregate — and runs the ONLY
  *    globally-ordered structure in the plan, a running-sum window
  *    over the bucket-totals table (bounded by the bucket count, never
  *    the corpus), yielding each bucket's global offset; the
  *    corpus-wide grand total rides the SAME bounded window pass
  *    (an unbounded-frame sum over the same ordering), so no separate
  *    `df.count()` recomputation is ever needed;
  *  - phase 2 runs the LOCAL running sum within each bucket — a window
  *    partitioned by bucket, parallel across buckets — and adds the
  *    broadcast bucket offset: `global offset = bucket offset + local
  *    offset`, exact because the bucket assignment is monotone in the
  *    order.
  *
  * Correctness does NOT depend on bucket balance (ties and hot buckets
  * only concentrate the local sort); scale does — size the bucket
  * expression so no single bucket holds a corpus-sized fraction. For a
  * tie-heavy order key, widen the quantization denominator or add more
  * of the tie-break into the bucket.
  */
object Selection {

  /** The shared two-phase core: append to every row
    *  - `offName`: the EXCLUSIVE global running sum of `weight` along
    *    `order` (0 for the first row — `weight = lit(1L)` makes
    *    `offName + 1` the global row_number), and
    *  - `totName`: the corpus-wide total of `weight` (same value on
    *    every row, carried by the broadcast bucket table — no second
    *    pass over `df`).
    *
    * `order` must be a TOTAL order (include a unique tie-break
    * column); `bucket` MUST be monotone non-decreasing along it —
    * that contract is the caller's to uphold (the DSIR oracle pins it
    * bit-for-bit for the shipped use). `weight` must be a non-null
    * long. Input columns pass through unchanged. */
  def withRunningTotals(
      df: DataFrame, bucket: Column, order: Seq[Column], weight: Column,
      offName: String, totName: String): DataFrame = {
    val in = df.withColumn("__sel_w", weight.cast("long"))
      .withColumn("__sel_bucket", bucket)
    // bounded-global-window: BOTH frames (exclusive prefix + grand
    // total) run over the aggregated bucket-totals table — one row per
    // distinct bucket value, bounded by the order key's value range,
    // never the corpus — in a single WindowExec pass
    val wPrev = Window.orderBy(col("__sel_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__sel_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = in.groupBy(col("__sel_bucket"))
      .agg(sum(col("__sel_w")).as("__sel_n"))
      .withColumn("__sel_boff", coalesce(sum(col("__sel_n")).over(wPrev), lit(0L)))
      .withColumn(totName, sum(col("__sel_n")).over(wAll))
    val wL = Window.partitionBy(col("__sel_bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    in.join(
        broadcast(offsets.select(col("__sel_bucket"), col("__sel_boff"),
          col(totName))),
        Seq("__sel_bucket"))
      .withColumn(offName,
        col("__sel_boff") + coalesce(sum(col("__sel_w")).over(wL), lit(0L)))
      .drop("__sel_bucket", "__sel_boff", "__sel_w")
  }

  /** Global `row_number()` along `order` as `rankName` (long,
    * 1-based), computed with the two-phase bucketed plan described in
    * the object doc. Same `bucket` contract as
    * [[withRunningTotals]]. */
  def withGlobalRank(
      df: DataFrame, bucket: Column, order: Seq[Column],
      rankName: String): DataFrame =
    withRunningTotals(df, bucket, order, lit(1L), "__sel_prevn", "__sel_total")
      .withColumn(rankName, col("__sel_prevn") + 1L)
      .drop("__sel_prevn", "__sel_total")

  /** Flag the top `ceil(n * frac)` rows of the corpus along `order` as
    * `flagName` (boolean) — corpus-wide top-fraction selection with no
    * unpartitioned window and no driver round-trip: the row count
    * rides the same broadcast bucket table as the rank offsets, so the
    * input is scanned exactly twice (the per-bucket aggregate and the
    * rank join), never a third time for the count. Same `bucket`
    * contract as [[withRunningTotals]]. */
  def topFracByOrder(
      df: DataFrame, bucket: Column, order: Seq[Column], frac: Double,
      flagName: String): DataFrame =
    withRunningTotals(df, bucket, order, lit(1L), "__sel_prevn", "__sel_total")
      .withColumn(flagName,
        col("__sel_prevn") + 1L <= ceil(col("__sel_total") * lit(frac)))
      .drop("__sel_prevn", "__sel_total")

  /** The GROUPED form of the two-phase decomposition: rank/total along
    * `order` WITHIN each `group` value (per-domain, per-source,
    * per-language selection — the "top X% of every domain" operator a
    * mixing pipeline runs after tagging). Strictly better-shaped than
    * the global form at scale: the bucket-totals table is
    * |groups| × |buckets| rows, and its prefix window is PARTITIONED
    * by group — there is no single-partition structure anywhere in the
    * plan, bounded or otherwise. Same `bucket` monotonicity contract
    * as [[withRunningTotals]], per group. */
  def withRunningTotalsPerGroup(
      df: DataFrame, group: Column, bucket: Column, order: Seq[Column],
      weight: Column, offName: String, totName: String): DataFrame = {
    val in = df.withColumn("__sel_w", weight.cast("long"))
      .withColumn("__sel_grp", group)
      .withColumn("__sel_bucket", bucket)
    val wPrev = Window.partitionBy(col("__sel_grp"))
      .orderBy(col("__sel_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("__sel_grp"))
      .orderBy(col("__sel_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = in.groupBy(col("__sel_grp"), col("__sel_bucket"))
      .agg(sum(col("__sel_w")).as("__sel_n"))
      .withColumn("__sel_boff", coalesce(sum(col("__sel_n")).over(wPrev), lit(0L)))
      .withColumn(totName, sum(col("__sel_n")).over(wAll))
    val wL = Window.partitionBy(col("__sel_grp"), col("__sel_bucket"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    in.join(
        broadcast(offsets.select(col("__sel_grp"), col("__sel_bucket"),
          col("__sel_boff"), col(totName))),
        Seq("__sel_grp", "__sel_bucket"))
      .withColumn(offName,
        col("__sel_boff") + coalesce(sum(col("__sel_w")).over(wL), lit(0L)))
      .drop("__sel_grp", "__sel_bucket", "__sel_boff", "__sel_w")
  }

  /** Flag the top `ceil(n_g * frac)` rows WITHIN each `group` along
    * `order` — per-group top-fraction selection with no
    * single-partition structure at all (see
    * [[withRunningTotalsPerGroup]]). */
  def topFracByOrderPerGroup(
      df: DataFrame, group: Column, bucket: Column, order: Seq[Column],
      frac: Double, flagName: String): DataFrame =
    withRunningTotalsPerGroup(df, group, bucket, order, lit(1L),
        "__sel_prevn", "__sel_total")
      .withColumn(flagName,
        col("__sel_prevn") + 1L <= ceil(col("__sel_total") * lit(frac)))
      .drop("__sel_prevn", "__sel_total")
}
