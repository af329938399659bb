package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.functions._

/** Remaining scalar/array/aggregation surface breadth (SURVEY.md §2.3):
  * array functions over the embedding column, pivot, exact
  * percentiles, conditional aggregation, and null-semantics functions.
  */
object Breadth {

  val queries: Seq[QueryDef] = Seq(

    // Array functions over ArrayType(FloatType) (order-free reductions
    // only, so Spark and DuckDB agree bit-for-bit on floats).
    QueryDef(
      "q_array_funcs",
      (s, d) => {
        import s.implicits._
        table(s, d, "embeddings")
          .select(
            $"vec_id",
            size($"embedding").as("dim"),
            element_at($"embedding", 1).cast("double").as("first_e"),
            element_at($"embedding", -1).cast("double").as("last_e"),
            array_min($"embedding").cast("double").as("min_e"),
            array_max($"embedding").cast("double").as("max_e"),
            array_contains($"embedding", 0.0f).cast("int").as("has_zero"),
            size(array_distinct($"embedding")).as("n_distinct"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
                     len(embedding) AS dim,
                     CAST(embedding[1] AS DOUBLE) AS first_e,
                     CAST(embedding[-1] AS DOUBLE) AS last_e,
                     CAST(list_min(embedding) AS DOUBLE) AS min_e,
                     CAST(list_max(embedding) AS DOUBLE) AS max_e,
                     CAST(list_contains(embedding, 0.0) AS INT) AS has_zero,
                     len(list_distinct(embedding)) AS n_distinct
              FROM embeddings ORDER BY vec_id""")),

    // Pivot: event counts per user by type (wide conditional agg).
    QueryDef(
      "q_pivot",
      (s, d) => {
        import s.implicits._
        table(s, d, "events")
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .count()
          .na.fill(0L)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
                     count(*) FILTER (event_type = 'click') AS click,
                     count(*) FILTER (event_type = 'view') AS view,
                     count(*) FILTER (event_type = 'purchase') AS purchase,
                     count(*) FILTER (event_type = 'signup') AS signup,
                     count(*) FILTER (event_type = 'error') AS error
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Exact percentiles over integral doubles (interpolation lands on
    // .0/.25/.5/.75 — exactly representable, so engines agree).
    QueryDef(
      "q_percentile",
      (s, d) => {
        import s.implicits._
        table(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.25)").as("p25_qty"),
            expr("percentile(l_quantity, 0.75)").as("p75_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.5) AS median_qty,
                     quantile_cont(l_quantity, 0.25) AS p25_qty,
                     quantile_cont(l_quantity, 0.75) AS p75_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Conditional aggregation (count_if / filtered sums).
    QueryDef(
      "q_conditional_agg",
      (s, d) => {
        import s.implicits._
        table(s, d, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            count_if($"o_totalprice" > 200000.0).as("n_big"),
            count_if($"o_orderpriority" === "1-URGENT").as("n_urgent"),
            max(when($"o_orderpriority" === "1-URGENT", $"o_totalprice")).as("max_urgent_price"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
                     count(*) FILTER (o_totalprice > 200000.0) AS n_big,
                     count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
                     max(o_totalprice) FILTER (o_orderpriority = '1-URGENT') AS max_urgent_price
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Arbitrary GROUPING SETS through the engine's SQL surface —
    // inline parquet relation (`FROM parquet.`path``), so the query
    // stays a pure function of (session, sfDir) with no shared
    // temp-view state to race on.
    QueryDef(
      "q_grouping_sets",
      (s, d) => {
        s.sql(s"""SELECT o_orderstatus, o_orderpriority,
                         CAST(grouping(o_orderstatus) AS INT) AS g_st,
                         CAST(grouping(o_orderpriority) AS INT) AS g_pr,
                         count(*) AS n
                  FROM parquet.`$d/orders.parquet`
                  GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                          (o_orderpriority), ())
                  ORDER BY g_st, g_pr,
                           o_orderstatus ASC NULLS FIRST,
                           o_orderpriority ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
                     CAST(grouping(o_orderstatus) AS INT) AS g_st,
                     CAST(grouping(o_orderpriority) AS INT) AS g_pr,
                     count(*) AS n
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                      (o_orderpriority), ())
              ORDER BY g_st, g_pr,
                       o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Map functions: per-user map<event_type, count> built from sorted
    // entries, then keyed back out. The oracle recomputes the same
    // facts relationally (map columns themselves don't round-trip
    // portably through parquet comparison).
    QueryDef(
      "q_map_funcs",
      (s, d) => {
        import s.implicits._
        val sub = table(s, d, "events")
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
        sub.groupBy($"user_id")
          .agg(map_from_entries(array_sort(collect_list(struct($"event_type", $"n"))))
            .as("m"))
          .select(
            $"user_id",
            size($"m").as("n_types"),
            array_join(map_keys($"m"), ",").as("keys"),
            coalesce(element_at($"m", "click"), lit(0L)).as("clicks"),
            coalesce(element_at($"m", "refund"), lit(0L)).as("refunds"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
                     count(DISTINCT event_type) AS n_types,
                     string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS keys,
                     count(*) FILTER (event_type = 'click') AS clicks,
                     count(*) FILTER (event_type = 'refund') AS refunds
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Deterministic hash split (train/val/test) — the reproducible
    // alternative to rng sampling for corpus partitioning: the split
    // is a pure function of the id, identical on any engine, cluster
    // size, or re-run. 80/10/10 via md5 bucket.
    QueryDef(
      "q_hash_split",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        table(s, d, "documents")
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .groupBy($"split", $"lang")
          .agg(count(lit(1)).as("n"), min($"doc_id").as("min_id"))
          .orderBy($"split", $"lang")
      },
      Some("""WITH t AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
                FROM documents)
              SELECT CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'val'
                          ELSE 'test' END AS split,
                     lang, count(*) AS n, min(doc_id) AS min_id
              FROM t GROUP BY 1, 2 ORDER BY split, lang""")),

    // Null semantics: nullif/coalesce/null-safe equality — the
    // reference's nullable value column behaviors (SURVEY.md §1.3).
    QueryDef(
      "q_null_handling",
      (s, d) => {
        import s.implicits._
        table(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            nullif($"l_discount", lit(0.0)).as("disc_or_null"))
          .groupBy($"l_orderkey")
          .agg(
            count(lit(1)).as("n"),
            count($"disc_or_null").as("n_discounted"),
            sum(coalesce($"disc_or_null", lit(0.0)).cast("decimal(18,2)")).cast("double").as("disc_sum"))
          .filter($"n" =!= $"n_discounted")
          .orderBy($"l_orderkey")
      },
      Some("""WITH t AS (
                SELECT l_orderkey, nullif(l_discount, 0.0) AS disc_or_null
                FROM lineitem)
              SELECT l_orderkey, count(*) AS n,
                     count(disc_or_null) AS n_discounted,
                     CAST(SUM(CAST(coalesce(disc_or_null, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS disc_sum
              FROM t GROUP BY l_orderkey
              HAVING count(*) <> count(disc_or_null)
              ORDER BY l_orderkey"""))
  )
}
