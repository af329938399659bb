package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Count Spark JOBS per query / per CC kernel invocation — the
  * committed before/after evidence for the round-18 fusion of the
  * connected-components per-round job pair (materialize-checkpoint +
  * 1-row convergence aggregate → ONE job whose convergence metric
  * rides the materialization via Dataset.observe). Job counts, unlike
  * seconds, are deterministic for a fixed input and plan, so they are
  * the honest artifact a no-Spark reviewer can check the claim
  * against.
  *
  * Usage: sbt "runMain graft.tools.CcJobCount <sfDir> <query...>"
  * Prints one `[ccjobs] <name> jobs=<n>` line per target: first the
  * two CC kernels in isolation on a synthetic 2-component chain graph
  * (8 vertices per chain — several propagation rounds each), then
  * each named declared query end-to-end (construction + noop sink). */
object CcJobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def counted(label: String)(body: => Unit): Unit = {
      // listener delivery is async — settle the bus before reading
      Thread.sleep(1500)
      jobs.set(0)
      body
      Thread.sleep(1500)
      println(s"[ccjobs] $label jobs=${jobs.get()}")
    }
    // the two CC kernels in isolation: 16 vertices in two 8-chains —
    // min-label propagation needs ~7 rounds (chain diameter), star
    // contraction ~3 (log-diameter), so per-round costs dominate
    val verts = spark.range(0, 16).select($"id")
    val edges = spark.range(0, 15).filter($"id" =!= 7L)
      .select($"id".as("id_a"), ($"id" + 1L).as("id_b"))
    counted("connectedMinLabels") {
      graft.ops.Dedup.connectedMinLabels(verts, edges)
        .write.format("noop").mode("overwrite").save()
    }
    counted("connectedStarContraction") {
      graft.ops.Dedup.connectedStarContraction(verts, edges)
        .write.format("noop").mode("overwrite").save()
    }
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      counted(n) {
        qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
