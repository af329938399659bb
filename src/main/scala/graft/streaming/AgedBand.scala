package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The ONE aged event-time state machine behind every online index
  * processor in [[NearDup]] (text pair + keep-first drop, image,
  * video, composed media, vector — six `flatMapGroupsWithState`
  * bodies, one cycle).
  *
  * Per band-key micro-batch invocation the cycle is:
  *
  *  1. **Timeout fired** (the watermark passed the newest retained
  *     entry's horizon with no new arrivals): the band key is stale —
  *     remove its whole state and emit nothing. This is what bounds
  *     the KEY population; per-entry eviction alone cannot remove an
  *     idle band whose processor never runs again.
  *  2. **Sort arrivals** by (event-time millis, id) so replays are
  *     deterministic and "earlier arrival" is well defined inside a
  *     micro-batch.
  *  3. Per arrival with a real event time: **evict** retained entries
  *     older than `arrivalTs - horizonMs` BEFORE it verifies —
  *     expired content stops pairing exactly at the horizon.
  *  4. **Verify** the arrival against the (post-eviction) retained
  *     list — the caller's lambda emits its pairs/drops.
  *  5. **Insert** the arrival as a retained entry unless the band
  *     already holds `maxPerBand` (insert regardless of the verify
  *     verdict — "earlier" means any prior arrival, which is what
  *     lets the drop decision replay in one SQL pass).
  *  6. **Re-arm** the key's removal clock past the newest entry's
  *     horizon, seeding from RETAINED entries, not just this
  *     micro-batch: a late-but-within-watermark arrival alone must
  *     not re-arm behind the newest retained entry's horizon (the
  *     round-12 lesson, now in one place). Never at-or-behind the
  *     watermark — Spark rejects that.
  *
  * Null-ts rows sit at `Long.MinValue` (sorting exactly where the
  * pre-aging id-only sort put them) and are exempt from step 3's
  * horizon eviction — they carry no event time to age by and would
  * otherwise be silently discarded before they could pair. They are
  * NOT exempt from step 1: a whole-key timeout removes the band's
  * state including its null-ts entries (key-level removal is the
  * design — an idle key's state must be reclaimable), and they count
  * against `maxPerBand` as permanent residents until then. Supply a
  * non-null ts for every row that should age; AgedBandSpec pins each
  * of these properties on the cycle directly.
  */
private[streaming] object AgedBand {

  /** A retained band-state entry: anything carrying its event-time
    * millis (`Long.MinValue` = no event time, exempt from horizon
    * eviction). All six processors' sig classes implement this. */
  trait Entry { def ts: Long }

  /** Run one band group's arrivals through the shared cycle.
    *
    * @param state   the group's state handle (removal + clock only —
    *                reading/writing the typed wrapper stays with the
    *                caller via `load`/`commit`, so each processor
    *                keeps its own state schema)
    * @param rows    this micro-batch's arrivals for the band key
    * @param rowTs   event-time millis of an arrival (Long.MinValue
    *                when absent)
    * @param rowId   the arrival's id — the deterministic tie-break
    *                within equal timestamps
    * @param load    the retained entries (newest first), read from
    *                the caller's state wrapper
    * @param verify  called once per arrival with the CURRENT retained
    *                list (post-eviction, pre-insert); emits by
    *                returning its output rows
    * @param mkEntry build the retained entry for an arrival given its
    *                event-time millis
    * @param commit  write the new retained list back into the
    *                caller's state wrapper
    */
  def process[R, E <: Entry, O](
      state: GroupState[_], rows: Iterator[R],
      rowTs: R => Long, rowId: R => Long, load: => List[E],
      horizonMs: Long, maxPerBand: Int, streaming: Boolean)(
      verify: (List[E], R) => Iterator[O],
      mkEntry: (R, Long) => E,
      commit: List[E] => Unit): Iterator[O] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = scala.collection.mutable.ArrayBuffer.empty[O]
    var seen = load
    var nSeen = seen.size
    var maxTs = seen.foldLeft(Long.MinValue)((m, p) => math.max(m, p.ts))
    rows.toSeq.sortBy(d => (rowTs(d), rowId(d))).foreach { d =>
      val dts = rowTs(d)
      if (horizonMs > 0 && dts > Long.MinValue) {
        val cutoff = dts - horizonMs
        if (seen.exists(p => p.ts != Long.MinValue && p.ts < cutoff)) {
          seen = seen.filter(p => p.ts == Long.MinValue || p.ts >= cutoff)
          nSeen = seen.size
        }
        if (dts > maxTs) maxTs = dts
      }
      out ++= verify(seen, d)
      if (nSeen < maxPerBand) { seen = mkEntry(d, dts) :: seen; nSeen += 1 }
    }
    commit(seen)
    if (horizonMs > 0 && streaming && maxTs > Long.MinValue)
      state.setTimeoutTimestamp(
        math.max(maxTs + horizonMs, state.getCurrentWatermarkMs + 1))
    out.iterator
  }
}
