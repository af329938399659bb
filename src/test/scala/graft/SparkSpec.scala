package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for ScalaTest suites — one JVM-wide session via
  * getOrCreate (sbt forks a single test JVM). */
trait SparkSpec {
  lazy val spark: SparkSession = graft.model.Tables.withSessionDefaults(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()
}
