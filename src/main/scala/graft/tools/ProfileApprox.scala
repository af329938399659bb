package graft.tools

import graft.model.Tables.table
import org.apache.spark.sql.functions._

/** One-off profile for the q_approx_distinct plan choice (see the
  * QueryDef notes in AdvancedRelational): times the registered query
  * plus its component aggregations at each given data dir. */
object ProfileApprox {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val spark = graft.model.Tables.buildLocalSession()
      import spark.implicits._
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        table(spark, dir, "region").count()
        def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
          df.write.format("noop").mode("overwrite").save() // warm
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          println(f"PROF $dir $name: ${ts(1)}%.2f s")
        }
        val li = table(spark, dir, "lineitem")
        time("registered")(graft.SparkEntry.queries("q_approx_distinct")(spark, dir))
        time("mixed_single_agg")(li.groupBy($"l_returnflag").agg(
          approx_count_distinct($"l_partkey").as("a"),
          countDistinct($"l_partkey").as("e")))
        time("hll_only")(li.groupBy($"l_returnflag").agg(
          approx_count_distinct($"l_partkey").as("a")))
        time("exact_only")(li.groupBy($"l_returnflag").agg(
          countDistinct($"l_partkey").as("e")))
      } finally spark.stop()
    }
  }
}
