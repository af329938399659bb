package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time window aggregations (SURVEY.md §2.3 streaming row):
  * tumbling, sliding, and session windows over the event stream.
  *
  * Each transform is a plain DataFrame -> DataFrame function, so the
  * SAME code runs as a batch query (oracle-checked below) and as a
  * Structured Streaming query (WindowsStreamSpec replays the identical
  * input through MemoryStream and asserts stream == batch). That
  * equivalence is the engine's replacement for the reference's
  * hand-rolled tick loops: no second code path for streaming.
  *
  * Scale: window aggregation shuffles once on (window, key); with
  * watermarking the state store holds only open windows, so executor
  * memory is bounded by (keys x open windows), not history length.
  */
object Windows {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Tumbling event-time windows per event type. */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Sliding event-time windows (width, slide) — each event lands in
    * width/slide windows. */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows per user: events closer than `gap` merge into one
    * session (reference has no such concept — engine-added gap
    * analysis over the sample stream). */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Watermarked streaming form of [[tumblingCounts]] — late data
    * beyond `lateness` is dropped, state for closed windows freed. */
  def tumblingCountsStream(events: DataFrame, width: String, lateness: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", lateness), width)

  /** The two sides of the purchase<-click interval join, shaped once
    * so the batch query and the streaming twin run the IDENTICAL join
    * (the module's no-second-code-path rule). */
  def purchaseSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))

  def clickSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))

  /** Stream-stream interval join core: each purchase enriched with the
    * same user's clicks from the preceding `window`. Batch: one
    * equi-join shuffle on user_id with the time bound as a residual
    * predicate (filters push to both parquet scans). Streaming: the
    * SAME call on two watermarked sides becomes Spark's stream-stream
    * inner join — the event-time bound lets the state store evict a
    * click once the purchase watermark passes c_ts + window, so state
    * is (clicks-per-user x window), not history (StreamJoinSpec pins
    * the cross-micro-batch behavior; the batch-equality test replays
    * the full table through MemoryStreams). */
  def purchaseClickJoin(
      purchases: DataFrame, clicks: DataFrame, window: String,
      joinType: String = "inner"): DataFrame =
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))

  /** Skew-resistant BATCH form of [[purchaseClickJoin]] — what the
    * registered queries run. The plain form's equi-key is user_id
    * alone, and a hot user's output is QUADRATIC in its event count
    * while its shuffle INPUT stays tiny — invisible to AQE's skew
    * split, which keys on partition bytes (measured: a planted
    * 20%-hot user serialized 99.9% of a 52M-row join into one task,
    * straggler 0.87 — `SKEW_JOIN_r15.json`'s `plain` entry). Here the
    * equi-key is (user_id, day): each click is exploded to the two
    * calendar days whose purchases it can serve, each purchase keeps
    * its own day, and the time bound stays as the residual predicate
    * — a matching pair joins exactly once (via the purchase's day),
    * so the output is value-identical for inner AND left-outer, while
    * a hot user's work now splits across its active days (and at
    * 100 TB across the whole retention window). Requires the window
    * to fit within one day — the two-day cover is what makes the
    * rewrite lossless.
    *
    * The "day" is a LONG day number whose buckets are provably 24h of
    * the type's own timeline, so the cover survives any session
    * timezone: wall-clock days for TIMESTAMP_NTZ (its interval
    * arithmetic is wall-clock, so every day is exactly 24h by
    * construction) and PHYSICAL epoch days (floor(epoch/86400)) for
    * zoned timestamps — where a calendar `to_date` would shrink to
    * 23h across a DST transition and silently drop a boundary match. */
  def purchaseClickJoinBucketed(
      purchases: DataFrame, clicks: DataFrame, window: String,
      joinType: String = "inner"): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(iv.months == 0 &&
        iv.days * 86400000000L + iv.microseconds <= 86400000000L,
      s"day-bucketed interval join requires window <= 24 hours, got '$window'")
    val (ptype, ctype) = (purchases.schema("p_ts").dataType,
      clicks.schema("c_ts").dataType)
    require(ptype == ctype,
      s"day-bucketed interval join requires matching timestamp types, " +
        s"got $ptype vs $ctype")
    val dayOf: Column => Column = ptype match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        ts => datediff(ts.cast("date"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long")
      case _ => ts => floor(unix_timestamp(ts) / lit(86400L))
    }
    val p = purchases.withColumn("__pday", dayOf(col("p_ts")))
    val c = clicks.withColumn("__cday",
      explode(array(dayOf(col("c_ts")), dayOf(col("c_ts")) + lit(1L))))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("__pday") === col("__cday") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Watermarked streaming form of [[purchaseClickJoin]]. With
    * `leftOuter`, a clickless purchase emits its null row only once
    * the watermark proves no in-window click can still arrive — the
    * state-eviction semantics StreamJoinSpec pins. */
  def purchaseClickJoinStream(
      purchases: DataFrame, clicks: DataFrame,
      window: String, lateness: String,
      joinType: String = "inner"): DataFrame =
    purchaseClickJoin(
      purchaseSide(purchases).withWatermark("p_ts", lateness),
      clickSide(clicks).withWatermark("c_ts", lateness),
      window, joinType)

  /** Batch form of exact streaming dedup: the first event per key
    * (earliest ts, unique id tie-break). The streaming twin is
    * [[firstPerKeyStream]]; WindowsStreamSpec asserts they agree when
    * arrival order matches event time. */
  def firstPerKey(events: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Streaming exact dedup: keep the first ARRIVAL per key, holding
    * per-key state only within the watermark horizon
    * (dropDuplicatesWithinWatermark) — the streaming-ingest form of
    * dd_exact, with state bounded by lateness instead of growing with
    * the corpus. */
  def firstPerKeyStream(events: DataFrame, keys: Seq[String], lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  val queries: Seq[QueryDef] = Seq(

    // Batch form of the streaming first-per-key dedup (earliest event
    // per (user_id, event_type)); the stream twin keeps first arrival
    // under a watermark and is equivalence-tested in WindowsStreamSpec.
    QueryDef(
      "w_dedup_first",
      (s, d) => {
        import s.implicits._
        firstPerKey(table(s, d, "events"), Seq("user_id", "event_type"))
          .select($"user_id", $"event_type", $"event_id", $"ts")
          .orderBy($"user_id", $"event_type")
      },
      Some("""WITH r AS (
                SELECT user_id, event_type, event_id, ts,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts ASC, event_id ASC) AS rn
                FROM events)
              SELECT user_id, event_type, event_id, ts
              FROM r WHERE rn = 1 ORDER BY user_id, event_type""")),

    QueryDef(
      "w_tumbling",
      (s, d) => {
        import s.implicits._
        tumblingCounts(table(s, d, "events"), "1 hour")
          .orderBy($"w_start", $"event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
                     count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    QueryDef(
      "w_sliding",
      (s, d) => {
        import s.implicits._
        slidingCounts(table(s, d, "events"), "1 hour", "15 minutes")
          .orderBy($"w_start", $"event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) - o * (INTERVAL '15 minutes') AS w_start,
                     event_type, count(*) AS n
              FROM events, unnest([0, 1, 2, 3]) AS t(o)
              GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    QueryDef(
      "w_session",
      (s, d) => {
        import s.implicits._
        sessionStats(table(s, d, "events"), "5 minutes")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts >= lag(ts) OVER w + INTERVAL '5 minutes'
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              numbered AS (
                SELECT user_id, ts, value,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
              SELECT min(ts) AS session_start,
                     max(ts) + INTERVAL '5 minutes' AS session_end,
                     user_id, count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM numbered GROUP BY user_id, sid
              ORDER BY user_id, session_start""")),

    // Stream-stream interval join, batch form (see purchaseClickJoin):
    // purchases enriched with the same user's clicks from the
    // preceding 24 hours. The streaming twin is the identical call on
    // two watermarked sides (purchaseClickJoinStream); StreamJoinSpec
    // asserts stream == batch on this very table plus the
    // state-eviction behavior across micro-batches.
    QueryDef(
      "w_join_interval",
      (s, d) => {
        import s.implicits._
        val ev = table(s, d, "events")
        purchaseClickJoinBucketed(purchaseSide(ev), clickSide(ev), "24 hours")
          .orderBy($"purchase_id", $"click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
                     c.event_id AS click_id, c.ts AS c_ts
              FROM events p JOIN events c
                ON p.event_type = 'purchase' AND c.event_type = 'click'
               AND c.user_id = p.user_id
               AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR
              ORDER BY purchase_id, click_id""")),

    // LEFT-OUTER form: every purchase, with null click columns when no
    // click preceded it within 24h — the streaming semantics corner
    // where an outer row may only emit after the watermark proves no
    // in-window click can still arrive (StreamJoinSpec pins that
    // deferred emission and stream == batch equality).
    QueryDef(
      "w_join_outer",
      (s, d) => {
        import s.implicits._
        val ev = table(s, d, "events")
        purchaseClickJoinBucketed(purchaseSide(ev), clickSide(ev), "24 hours", "left_outer")
          .orderBy($"purchase_id", $"click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
                     c.event_id AS click_id, c.ts AS c_ts
              FROM events p LEFT JOIN events c
                ON c.event_type = 'click' AND c.user_id = p.user_id
               AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR
              WHERE p.event_type = 'purchase'
              ORDER BY purchase_id, click_id"""))
  )
}
