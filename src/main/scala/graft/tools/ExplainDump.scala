package graft.tools

/** Write each query's `explain("formatted")` text to a file — the
  * plan evidence the optimization rounds commit under `plans/<round>/`.
  * Usage: sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <query...>"
  * writes `<outDir>/<query>_<suffix>.txt` per query. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args: @unchecked
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
