package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The genuinely-stateful pieces of the reference daemon, as
  * `flatMapGroupsWithState` operators (SURVEY.md §7.4 "hard parts"):
  *
  *  - per-channel poll cadence (D2): a channel is read when
  *    `now - last_read_at > timing` seconds, first read always due
  *    (reference bus.py:38-49);
  *  - stall detection with cooloff (D11): once an acquisition tick has
  *    overrun 1 s MORE than five consecutive times (i.e. on the 6th —
  *    `stall_count > BUS_STALL_COUNT`), a 3 s cooloff fires
  *    (reference daq-3i.py:24-25, 233-260).
  *
  * State is per-key and O(1): one (lastEmit, counter) record per
  * channel/bus, so a 10^7-channel deployment holds ~10^7 tiny state
  * rows sharded across executors — exactly what the state store is
  * for. Works identically over a batch Dataset (single batch) and a
  * MemoryStream-fed streaming Dataset across micro-batches
  * (CadenceSpec covers both).
  */
object Cadence {

  /** One candidate poll tick for a channel. ts in epoch millis;
    * timing is the channel's poll period in millis. */
  case class Tick(channel_id: Long, ts_ms: Long, timing_ms: Long, value: Double)

  /** A tick that passed the due filter. */
  case class DueSample(channel_id: Long, ts_ms: Long, value: Double)

  case class DueState(lastEmit: Long)

  /** One acquisition-loop iteration of a bus with its elapsed time. */
  case class BusTick(bus_id: Long, ts_ms: Long, elapsed_ms: Long)

  /** A detected stall: more than STALL_LIMIT consecutive overruns —
    * the 6th is the trigger (daq-3i.py:253-260). */
  case class Stall(bus_id: Long, ts_ms: Long, consecutive: Int)

  case class StallState(count: Int)

  val STALL_LIMIT = 5        // BUS_STALL_COUNT, daq-3i.py:24
  val TICK_BUDGET_MS = 1000L // 1 s acquisition tick target, daq-3i.py:250

  /** D2: emit only the ticks that are due under the per-channel poll
    * period. Mirrors check_read_due exactly: first tick always due;
    * otherwise due iff ts - lastEmit > timing (strict, bus.py:46). */
  def dueFilter(ticks: Dataset[Tick]): Dataset[DueSample] = {
    implicit val enc = Encoders.product[DueSample]
    ticks
      .groupByKey(_.channel_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Tick], state: GroupState[DueState]) =>
          val sorted = rows.toSeq.sortBy(t => (t.ts_ms, t.value))
          var last = state.getOption.map(_.lastEmit)
          val out = Seq.newBuilder[DueSample]
          sorted.foreach { t =>
            val due = last.forall(l => t.ts_ms - l > t.timing_ms)
            if (due) {
              out += DueSample(t.channel_id, t.ts_ms, t.value)
              last = Some(t.ts_ms)
            }
          }
          last.foreach(l => state.update(DueState(l)))
          out.result().iterator
      }(Encoders.product[DueState], enc)
  }

  /** D11: emit a Stall event when consecutive overruns EXCEED
    * STALL_LIMIT (`stall_count > BUS_STALL_COUNT`, so the 6th
    * consecutive overrun fires); the counter then resets (the cooloff
    * — daq-3i.py:256-260 sleeps and zeroes the counter). */
  def stallMonitor(ticks: Dataset[BusTick]): Dataset[Stall] = {
    implicit val enc = Encoders.product[Stall]
    ticks
      .groupByKey(_.bus_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[BusTick], state: GroupState[StallState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_ms)
          var count = state.getOption.map(_.count).getOrElse(0)
          val out = Seq.newBuilder[Stall]
          sorted.foreach { t =>
            if (t.elapsed_ms > TICK_BUDGET_MS) {
              count += 1
              if (count > STALL_LIMIT) {
                out += Stall(t.bus_id, t.ts_ms, count)
                count = 0 // cooloff resets the counter
              }
            } else count = 0
          }
          state.update(StallState(count))
          out.result().iterator
      }(Encoders.product[StallState], enc)
  }
}
