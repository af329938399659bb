package graft.tools


/** Time individual queries warm (2 runs each) for plan iteration.
  * Usage: sbt "runMain graft.tools.Profile <sfDir> <query...>" */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // noop sink, like Bench: count() would let column pruning skip
        // the projection work being profiled
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROFILE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
