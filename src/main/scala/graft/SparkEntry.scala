package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in the `graft.ops` / `graft.streaming` modules as
  * [[QueryDef]]s (DataFrame program + optional DuckDB oracle SQL); this
  * object is only the aggregation point the driver harness reads.
  */
object SparkEntry {

  /** Full registry: reference-surface relational ops + engine-added
    * analytics + LLM-pipeline ops + batch-equivalent streaming forms. */
  val all: Seq[QueryDef] =
    ops.Relational.queries ++ ops.AdvancedRelational.queries ++
      ops.Breadth.queries ++ ops.Scale.queries ++
      ops.TimeSeries.queries ++ ops.ReferenceOps.queries ++
      ops.TextAnalysis.queries ++ ops.Tokenize.queries ++
      ops.LmScore.queries ++ ops.Dsir.queries ++ ops.Curate.queries ++
      ops.Classify.queries ++
      ops.Pii.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.ProductQuant.queries ++
      ops.IvfPq.queries ++ ops.IvfAdd.queries ++ ops.IvfPqAdd.queries ++
      ops.Mining.queries ++
      ops.Multimodal.queries ++ ops.Pipeline.queries ++
      streaming.Windows.queries ++ streaming.NearDup.queries ++
      streaming.AnnServe.queries ++ streaming.LmServe.queries ++
      streaming.StreamCorpus.queries ++ streaming.Batching.queries ++
      streaming.ClassifyServe.queries ++ streaming.MixServe.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest-sample-per-channel — the engine idiom that replaces the
    * reference's dirty-flag buffer (SURVEY.md §2.1 D5). */
  def entry(spark: SparkSession): DataFrame =
    queries("d5_latest_per_key")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueryMap(all)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.toOracleMap(all)
}
