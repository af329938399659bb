package graft.ops

import graft.QueryDef
import graft.functions.{Conversions, ModbusDecode}
import graft.model.Tables.table
import org.apache.spark.sql.functions._

/** Oracle-checked query forms of the reference's dataflow operators
  * (SURVEY.md §2.1): register decode (D3), conversion expressions (D4),
  * per-key retention (D9) and its victim set. Register words are
  * synthesized deterministically from `events.event_id` so the DuckDB
  * oracle can replay the exact same arithmetic.
  */
object ReferenceOps {

  val queries: Seq[QueryDef] = Seq(

    // D3: format decode over raw register words (reference
    // modbus.py:58-166), aggregated per format code. FLOAT (7) is
    // excluded here because IEEE-754 reassembly is not expressible in
    // portable ANSI SQL — it is covered bit-exactly by ModbusDecodeSpec.
    QueryDef(
      "d3_decode",
      (s, d) => {
        import s.implicits._
        val e = table(s, d, "events")
        // event_id is reduced mod 65536 BEFORE the multiply: congruent
        // mod 65536 (identical register values), but the product stays
        // under 2^48, so an id past 2^63/2654435761 ≈ 3.5e9 — a week
        // at the stated scale — cannot overflow under ANSI mode
        e.select(
            $"event_id",
            pmod($"event_id", lit(14L)).as("format_code"),
            array(
              pmod(pmod($"event_id", lit(65536L)) * lit(2654435761L), lit(65536L)).cast("int"),
              pmod(pmod($"event_id", lit(65536L)) * lit(40503L) + lit(7919L), lit(65536L)).cast("int")
            ).as("registers"))
          .filter($"format_code" =!= lit(7L))
          .withColumn("value", ModbusDecode.decode($"format_code", $"registers"))
          .groupBy($"format_code")
          .agg(
            count(lit(1)).as("n"),
            count($"value").as("n_decoded"),
            // values are integral (FLOAT excluded) — decimal partials
            // keep the cross-row sum exact and order-insensitive where
            // a raw double sum would round past 2^53
            sum($"value".cast("decimal(38,0)")).cast("long").as("sum_value"))
          .orderBy($"format_code")
      },
      Some("""WITH t AS (
                SELECT event_id % 14 AS format_code,
                       ((event_id % 65536) * 2654435761) % 65536 AS r0,
                       ((event_id % 65536) * 40503 + 7919) % 65536 AS r1
                FROM events
              ), dec AS (
                SELECT format_code,
                       CASE
                         WHEN format_code = 0 THEN CASE WHEN r0 >= 32768 THEN r0 - 65536 ELSE r0 END
                         WHEN format_code IN (1, 2) THEN
                           CASE WHEN r1 * 65536 + r0 >= 2147483648 THEN r1 * 65536 + r0 - 4294967296
                                ELSE r1 * 65536 + r0 END
                         WHEN format_code IN (4, 12) THEN r0
                         WHEN format_code IN (5, 13) THEN r1 * 65536 + r0
                         ELSE NULL
                       END AS v
                FROM t WHERE format_code <> 7
              )
              SELECT format_code, COUNT(*) AS n, COUNT(v) AS n_decoded,
                     CAST(SUM(v) AS BIGINT) AS sum_value
              FROM dec GROUP BY format_code ORDER BY format_code""")),

    // D4: per-channel conversion expressions (reference conversion.py)
    // compiled to one CASE of Catalyst expressions. Ids 5/6 are a
    // malformed program and an unknown-symbol program -> null
    // (conversion.py:13-15); unmatched ids pass through.
    QueryDef(
      "d4_conversion",
      (s, d) => {
        import s.implicits._
        val convs = Seq(
          1L -> "Value = x * 10",
          2L -> "Value = x + 273.15",
          3L -> "Value = (x - 32) * 5 / 9",
          4L -> "Value = sqrt(abs(x))",
          5L -> "Value = not a valid ((program",
          6L -> "Value = y * 2")
        table(s, d, "events")
          .select($"event_id", pmod($"event_id", lit(8L)).as("conversion_id"), $"value")
          .withColumn("converted",
            Conversions.applyConversions(convs, $"conversion_id", $"value"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, event_id % 8 AS conversion_id, value,
                     CASE event_id % 8
                       WHEN 1 THEN value * 10
                       WHEN 2 THEN value + 273.15
                       WHEN 3 THEN (value - 32) * 5 / 9
                       WHEN 4 THEN sqrt(abs(value))
                       WHEN 5 THEN NULL
                       WHEN 6 THEN NULL
                       ELSE value
                     END AS converted
              FROM events ORDER BY event_id""")),

    // D9 with a per-key history_len dimension (reference
    // channels.history_len, daq-3i.py:199): broadcast dim join + one
    // window — the fact table shuffles once, on its own key.
    QueryDef(
      "d9_retention_perkey",
      (s, d) => {
        import s.implicits._
        val e = table(s, d, "events")
        val dim = e.select($"user_id").distinct()
          .withColumn("history_len", (pmod($"user_id", lit(7L)) + lit(1L)).cast("int"))
        Maintenance.retainNewestPerKey(
            e, $"user_id", Seq($"ts", $"event_id"),
            dim, $"user_id", $"history_len")
          .select($"user_id", $"event_id")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id FROM (
                SELECT user_id, event_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn <= user_id % 7 + 1 ORDER BY user_id, event_id""")),

    // D9 victim set (what the reference DELETEs, daq-3i.py:209-214) in
    // ONE window pass (rank > history): the kept+anti-join form costs
    // two more shuffles on the unique key for the identical set — the
    // 10x amplified run measured it super-linear (0.6s -> 53s) where
    // this form scales with the data (MaintenanceSpec pins the
    // equivalence, the oracle SQL is unchanged and is itself this shape).
    QueryDef(
      "d9_victims",
      (s, d) => {
        import s.implicits._
        val e = table(s, d, "events")
        Maintenance.evictNewest(e, Seq($"user_id"), Seq($"ts", $"event_id"), 5)
          .select($"event_id", $"user_id")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id FROM (
                SELECT event_id, user_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn > 5 ORDER BY event_id"""))
  )
}
