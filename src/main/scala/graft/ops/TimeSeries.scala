package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over the sample stream — the analytics a
  * channel_data fact table exists for (reference: the `events` table is
  * the driver's stand-in for channel_data, user_id ≅ channel_id):
  *
  *  - OHLC downsampling: per key per bucket, open/high/low/close +
  *    count/sum — the lossy compaction every monitoring UI reads from;
  *  - grid resampling with forward-fill: a regular per-key time grid
  *    where each cell carries the latest sample at-or-before it — the
  *    join-ready form of irregular samples.
  *
  * Both are single-window / single-aggregation plans partitioned by
  * key: one shuffle, no self-joins, no state — at 100 TB the bucket
  * count per key bounds output, and the grid is generated with
  * `sequence` per key on executors (never a driver-side calendar). */
object TimeSeries {

  val queries: Seq[QueryDef] = Seq(

    // OHLC downsample: hourly buckets per user. Open/close via
    // min_by/max_by over the unique (ts, event_id) order — ONE
    // partial-aggregable hash aggregate, no window sort at all (the
    // oracle replays the equivalent row_number formulation; results
    // are identical because the order key is unique).
    QueryDef(
      "ts_downsample",
      (s, d) => {
        import s.implicits._
        table(s, d, "events")
          .withColumn("bucket", date_trunc("hour", $"ts"))
          .groupBy($"user_id", $"bucket")
          .agg(
            count(lit(1)).as("n"),
            min($"value").as("low"),
            max($"value").as("high"),
            min_by($"value", struct($"ts", $"event_id")).as("open"),
            max_by($"value", struct($"ts", $"event_id")).as("close"),
            sum($"value".cast(DecimalType(18, 2))).cast("double").as("total"))
          .orderBy($"user_id", $"bucket")
      },
      Some("""WITH t AS (
                SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                          ORDER BY ts ASC, event_id ASC) AS rn_a,
                       row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                          ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events)
              SELECT user_id, bucket, count(*) AS n,
                     min(value) AS low, max(value) AS high,
                     max(CASE WHEN rn_a = 1 THEN value END) AS open,
                     max(CASE WHEN rn_d = 1 THEN value END) AS close,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM t GROUP BY user_id, bucket
              ORDER BY user_id, bucket""")),

    // Grid resample + forward fill: one cell per user per hour over
    // the user's own span; each cell carries the latest sample
    // at-or-before the cell time. Implemented as union + one
    // last(IGNORE NULLS) window — no join, no state.
    QueryDef(
      "ts_resample_ffill",
      (s, d) => {
        import s.implicits._
        val e = table(s, d, "events")
        val grid = e.groupBy($"user_id")
          .agg(date_trunc("hour", min($"ts")).as("t0"),
            date_trunc("hour", max($"ts")).as("t1"))
          .select($"user_id",
            explode(sequence($"t0", $"t1", expr("interval 1 hour"))).as("ts"))
          .select($"user_id", $"ts", lit(0).as("marker"),
            lit(-1L).as("event_id"), lit(null).cast("double").as("value"))
        val samples = e.select($"user_id", $"ts", lit(1).as("marker"),
          $"event_id", $"value")
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"marker".desc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        // no final global sort: the result is a deterministic SET (the
        // driver's compare row-sorts before hashing, and a 100 TB grid
        // would never be globally ordered just to be written) — the
        // window has already clustered rows by user_id within
        // partitions, which is the locality a downstream join wants.
        // The grid is this query's 10x-at-10x output; the range sort
        // was its single heaviest stage in the amplified run.
        samples.unionByName(grid)
          .withColumn("ffill",
            last(when($"marker" === 1, $"value"), ignoreNulls = true).over(w))
          .filter($"marker" === 0)
          .select($"user_id", $"ts", $"ffill")
      },
      Some("""WITH spans AS (
                SELECT user_id, date_trunc('hour', min(ts)) AS t0,
                       date_trunc('hour', max(ts)) AS t1
                FROM events GROUP BY user_id),
              grid AS (
                SELECT user_id, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS ts,
                       0 AS marker, CAST(-1 AS BIGINT) AS event_id,
                       CAST(NULL AS DOUBLE) AS value
                FROM spans),
              unioned AS (
                SELECT user_id, ts, 1 AS marker, event_id, value FROM events
                UNION ALL
                SELECT user_id, ts, marker, event_id, value FROM grid),
              filled AS (
                SELECT user_id, ts, marker,
                       last_value(CASE WHEN marker = 1 THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id
                               ORDER BY ts ASC, marker DESC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
                FROM unioned)
              SELECT user_id, ts, ffill FROM filled WHERE marker = 0"""))
  )
}
