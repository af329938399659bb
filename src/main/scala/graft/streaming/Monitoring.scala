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
      numInputRows: Long,
      // backpressure surface: sustained input rate above processing
      // rate means the source backlog GROWS — the metric a 100 TB
      // operator pages on before any batch actually overruns
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      addBatchMs: Long,
      stateRows: Long)

  /** Per-query health roll-up — the page/dashboard surface. */
  case class QueryHealth(
      batches: Long, maxTriggerMs: Long, avgTriggerMs: Double,
      overruns: Long, maxConsecutiveOverruns: Int, backlogged: Long)

  private val stats = new ConcurrentLinkedQueue[BatchStat]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    def dur(k: String): Long =
      Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)
    def rate(d: Double): Double = if (d.isNaN) 0.0 else d
    stats.add(BatchStat(p.id.toString, p.batchId, dur("triggerExecution"),
      p.numInputRows,
      rate(p.inputRowsPerSecond), rate(p.processedRowsPerSecond),
      dur("addBatch"),
      p.stateOperators.map(_.numRowsTotal).sum))
    ()
  }

  /** All recorded batches, oldest first. */
  def batches: Seq[BatchStat] = stats.asScala.toSeq

  /** Batches that overran the tick budget (the reference's stall
    * signal, daq-3i.py:253-256, at query granularity). */
  def overruns: Seq[BatchStat] = batches.filter(_.durationMs > budgetMs)

  /** Batches whose input rate exceeded the processing rate — each one
    * grows the source backlog; a RUN of them is the early page. */
  def backlogged: Seq[BatchStat] =
    batches.filter(b => b.numInputRows > 0 &&
      b.inputRowsPerSecond > b.processedRowsPerSecond)

  /** Per-query health roll-up for the metrics sink / dashboard. */
  def health: Map[String, QueryHealth] = {
    val consec = maxConsecutiveOverruns
    batches.groupBy(_.queryId).map { case (q, bs) =>
      q -> QueryHealth(
        batches = bs.size.toLong,
        maxTriggerMs = bs.map(_.durationMs).max,
        avgTriggerMs = bs.map(_.durationMs).sum.toDouble / bs.size,
        overruns = bs.count(_.durationMs > budgetMs).toLong,
        maxConsecutiveOverruns = consec.getOrElse(q, 0),
        backlogged = bs.count(b => b.numInputRows > 0 &&
          b.inputRowsPerSecond > b.processedRowsPerSecond).toLong)
    }
  }

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
