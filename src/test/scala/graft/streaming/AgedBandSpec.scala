package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for [[AgedBand.process]] — the ONE aged state machine all
  * six online index processors share. The six Stream*Specs pin each
  * processor's end-to-end semantics; this spec pins the cycle itself
  * (evict / null-ts exemption / clock seeding / re-arm / cap /
  * timeout removal) directly against Spark's TestGroupState, so the
  * next aging change is provable in one place. */
class AgedBandSpec extends AnyFunSuite {

  case class Sig(id: Long, ts: Long) extends AgedBand.Entry
  // an arrival is (eventTimeMs, id); verify emits (retainedId, arrivingId)
  type Row = (Long, Long)

  private def run(
      arrivals: Seq[Row], seen0: List[Sig], horizonMs: Long,
      maxPerBand: Int = Int.MaxValue, streaming: Boolean = true,
      watermarkMs: Long = 0L, hasTimedOut: Boolean = false):
      (Seq[(Long, Long)], TestGroupState[List[Sig]]) = {
    val state = TestGroupState.create[List[Sig]](
      if (seen0.isEmpty) Optional.empty[List[Sig]]() else Optional.of(seen0),
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout,
      0L,
      if (streaming) Optional.of(watermarkMs) else Optional.empty[Long](),
      hasTimedOut)
    val out = AgedBand.process[Row, Sig, (Long, Long)](
      state, arrivals.iterator, _._1, _._2,
      state.getOption.getOrElse(Nil), horizonMs, maxPerBand, streaming)(
      (seen, d) => seen.iterator.map(p => (p.id, d._2)),
      (d, dts) => Sig(d._2, dts),
      seen => state.update(seen)).toSeq
    (out, state)
  }

  test("timeout fired: whole-key state (incl. null-ts entries) removed, nothing emitted") {
    val (out, state) = run(Nil, List(Sig(1, 1000L), Sig(2, Long.MinValue)),
      horizonMs = 500L, hasTimedOut = true)
    assert(out.isEmpty)
    assert(state.isRemoved)
  }

  test("horizon eviction runs BEFORE verify: expired entries stop pairing and leave state") {
    // retained at ts=100; arrival at ts=1000 with horizon 500 -> cutoff 500
    val (out, state) = run(Seq((1000L, 9L)), List(Sig(1, 100L)), horizonMs = 500L)
    assert(out.isEmpty, "evicted entry must not pair")
    assert(state.get == List(Sig(9, 1000L)), "state holds only the arrival")
  }

  test("within-horizon entries pair and are retained") {
    val (out, state) = run(Seq((1000L, 9L)), List(Sig(1, 600L)), horizonMs = 500L)
    assert(out == Seq((1L, 9L)))
    assert(state.get.toSet == Set(Sig(1, 600L), Sig(9, 1000L)))
  }

  test("null-ts entries are exempt from horizon eviction and still pair") {
    val (out, state) = run(
      Seq((1000L, 9L)), List(Sig(1, Long.MinValue), Sig(2, 100L)), horizonMs = 500L)
    assert(out == Seq((1L, 9L)), "null-ts pairs; the aged-out ts=100 does not")
    assert(state.get.contains(Sig(1, Long.MinValue)))
    assert(!state.get.exists(_.id == 2))
  }

  test("null-ts arrivals neither evict others nor age (they sort first)") {
    // null-ts arrival (MinValue) must not compute a cutoff
    val (out, state) = run(Seq((Long.MinValue, 9L)), List(Sig(1, 100L)), horizonMs = 500L)
    assert(out == Seq((1L, 9L)))
    assert(state.get.toSet == Set(Sig(1, 100L), Sig(9, Long.MinValue)))
  }

  test("maxPerBand caps inserts; null-ts permanent residents count against it") {
    val seen0 = List(Sig(1, Long.MinValue), Sig(2, Long.MinValue))
    val (out, state) = run(Seq((1000L, 9L), (1001L, 10L)), seen0,
      horizonMs = 500L, maxPerBand = 3)
    // arrival 9 fills the band (cap 3); arrival 10 still verifies vs all 3
    assert(out.toSet == Set((1L, 9L), (2L, 9L), (1L, 10L), (2L, 10L), (9L, 10L)))
    assert(state.get.size == 3 && !state.get.exists(_.id == 10))
  }

  test("arrivals process in (ts, id) order regardless of input order") {
    val (out, _) = run(Seq((1001L, 9L), (1000L, 5L)), Nil, horizonMs = 0L)
    assert(out == Seq((5L, 9L)), "the earlier-ts row must be the earlier arrival")
    val (out2, _) = run(Seq((1000L, 9L), (1000L, 5L)), Nil, horizonMs = 0L)
    assert(out2 == Seq((5L, 9L)), "equal ts breaks ties by id")
  }

  test("re-arm clock seeds from RETAINED entries, not just the micro-batch") {
    // retained newest ts=1000; late-but-within-watermark arrival at 100
    // must re-arm at 1000+500, NOT 100+500 (the round-12 bug)
    val (_, state) = run(Seq((100L, 9L)), List(Sig(1, 1000L)),
      horizonMs = 500L, watermarkMs = 50L)
    assert(state.getTimeoutTimestampMs.get == 1500L)
  }

  test("re-arm is never at-or-behind the watermark") {
    val (_, state) = run(Seq((1000L, 9L)), Nil, horizonMs = 500L,
      watermarkMs = 2000L)
    assert(state.getTimeoutTimestampMs.get == 2001L)
  }

  test("batch execution (streaming=false) arms no timeout; horizonMs=0 disables aging") {
    val (_, s1) = run(Seq((1000L, 9L)), List(Sig(1, 100L)),
      horizonMs = 500L, streaming = false)
    assert(!s1.getTimeoutTimestampMs.isPresent)
    assert(!s1.get.exists(_.id == 1), "eviction still applies under batch")
    val (out2, s2) = run(Seq((1000L, 9L)), List(Sig(1, 100L)), horizonMs = 0L)
    assert(out2 == Seq((1L, 9L)), "unaged: nothing evicts")
    assert(!s2.getTimeoutTimestampMs.isPresent)
  }
}
