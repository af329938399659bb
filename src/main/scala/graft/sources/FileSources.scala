package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Engine-added file source/sink surface beyond parquet (SURVEY.md
  * §2.3 scans row): CSV and JSON with explicit schemas — schema-on-read
  * is pinned, never inferred twice, so a 100 TB directory listing
  * doesn't trigger an inference scan. */
object FileSources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip — the second columnar format a warehouse
    * migration meets; same pinned-schema stance as CSV/JSON. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JDBC batch append (reference sink D6/D11: row-at-a-time ORM
    * inserts, daq-3i.py:272-281 — here one batched executor-side write
    * per partition). Exercised against embedded Derby in
    * FileSourcesSpec; the URL swaps for MySQL in a deployment
    * (db_model.py:65-67). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: String = "append", batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()

  /** JDBC reader (reference source: config dims, daq-3i.py:112-114).
    * Partitioned on a numeric column so a big table splits across
    * executors — every executor opens its own connection for its
    * stride, the driver never funnels rows. */
  def jdbcReader(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): org.apache.spark.sql.DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 10000)
}
