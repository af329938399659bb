package graft.tools


/** Dump a query's FINAL executed plan (post-AQE: after execution, so
  * runtime exchange reuse / skew handling are visible) for plan
  * iteration. Usage: sbt "runMain graft.tools.PlanDump <sfDir> <query...>" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS QueryExecution (a .write would build a fresh one,
      // whose AdaptiveSparkPlan would print un-finalized)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"==== $name ====")
      println(p)
      def c(re: String): Int = re.r.findAllIn(p).length
      println(s"PLANSTAT $name exchanges=${c("Exchange (hash|range|Single)")} " +
        s"reused=${c("ReusedExchange")} aqeReads=${c("AQEShuffleRead")} " +
        s"sortMerge=${c("SortMergeJoin")} shuffledHash=${c("ShuffledHashJoin")} " +
        s"broadcast=${c("BroadcastHashJoin")}")
    }
    spark.stop()
  }
}
