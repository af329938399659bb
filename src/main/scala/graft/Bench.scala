package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Protocol (round 6 — the round-5 artifact was 3× degraded by shared-
  * session state accumulation, see Tables.buildLocalSession):
  *  - a FRESH SparkSession per query, built through the one shared
  *    constructor all harnesses use — queries can no longer contaminate
  *    each other through storage blocks / shuffle state / page churn,
  *    and alphabetical order stops mattering;
  *  - per session, one-time infra costs (codegen init, parquet reader
  *    JIT) are absorbed by two throwaway jobs before anything is timed;
  *  - per query, one untimed warmup execution (whole-stage-codegen JIT
  *    compiles on first run) then the MEDIAN of three timed runs —
  *    single samples on a busy local JVM showed sporadic multi-second
  *    stalls (one run timed q5_multi_join at 19.8 s, the rerun at 1.2 s);
  *  - noop sink: forces full evaluation of every projected column
  *    (count() would let Catalyst prune the very expressions a
  *    projection query exists to exercise) at zero disk cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val spark = graft.model.Tables.buildLocalSession()
      val t0 = System.nanoTime()
      val r =
        try {
          spark.range(1000).selectExpr("sum(id)").collect()
          graft.model.Tables.table(spark, sfDir, "region").count()
          def force(): Unit =
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          force()
          val samples = (1 to 3).map { _ =>
            val t1 = System.nanoTime()
            force()
            (System.nanoTime() - t1) / 1e9
          }.sorted
          (samples(1), Option.empty[String])
        } catch { case e: Throwable =>
          // a crashed query reports the elapsed time of the failing
          // attempt, never NaN (the JSON must stay parseable)
          ((System.nanoTime() - t0) / 1e9, Some(e.getClass.getSimpleName))
        } finally spark.stop()
      name -> r
    }.toMap
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val failed = results.count(_._2._2.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"errors":$errs,"sf":"$sfDir"}""")
  }
}
