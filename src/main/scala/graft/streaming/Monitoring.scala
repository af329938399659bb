package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Engine-level monitoring surface for the streaming pipelines — the
  * Spark-native mapping of the reference's stall bookkeeping
  * (daq-3i.py:233-260) at the QUERY level, complementing the per-key
  * [[Cadence.stallMonitor]]: a StreamingQueryListener records each
  * micro-batch's duration and input rate, and [[overruns]] surfaces
  * batches that exceeded the tick budget — the signal an operator
  * pages on when a bus slows down.
  */
class Monitoring(budgetMs: Long = Cadence.TICK_BUDGET_MS)
    extends StreamingQueryListener {

  case class BatchStat(queryId: String, batchId: Long, durationMs: Long,
      numInputRows: Long)

  private val stats = new ConcurrentLinkedQueue[BatchStat]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    stats.add(BatchStat(p.id.toString, p.batchId, duration, p.numInputRows))
    ()
  }

  /** All recorded batches, oldest first. */
  def batches: Seq[BatchStat] = stats.asScala.toSeq

  /** Batches that overran the tick budget (the reference's stall
    * signal, daq-3i.py:253-256, at query granularity). */
  def overruns: Seq[BatchStat] = batches.filter(_.durationMs > budgetMs)

  /** Consecutive-overrun count per query — EXCEEDING
    * Cadence.STALL_LIMIT (i.e. the 6th consecutive overrun,
    * `stall_count > BUS_STALL_COUNT`, daq-3i.py:256) is the
    * reference's cooloff trigger. */
  def maxConsecutiveOverruns: Map[String, Int] =
    batches.groupBy(_.queryId).map { case (q, bs) =>
      val runs = bs.sortBy(_.batchId)
        .foldLeft((0, 0)) { case ((cur, best), b) =>
          val c = if (b.durationMs > budgetMs) cur + 1 else 0
          (c, math.max(best, c))
        }
      q -> runs._2
    }
}

object Monitoring {
  /** Attach a fresh monitor to the session's streams. */
  def attach(spark: SparkSession, budgetMs: Long = Cadence.TICK_BUDGET_MS): Monitoring = {
    val m = new Monitoring(budgetMs)
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: Monitoring): Unit =
    spark.streams.removeListener(m)
}
