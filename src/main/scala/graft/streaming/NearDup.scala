package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE near-duplicate detection — streaming MinHash-LSH.
  *
  * The batch dedup family (graft.ops.Dedup) answers "which documents
  * in this corpus are near-dups of each other"; an ingest pipeline
  * needs the ONLINE form: as each document arrives, which
  * already-ingested documents is it a near-dup of? This module keeps
  * the LSH index AS STREAMING STATE: documents explode to their
  * minhash band keys (the same in-row signature stage as the batch
  * family — one compiled pass, no exchange), and a
  * `flatMapGroupsWithState` keyed by band holds the gram-hash sets of
  * previously-arrived documents in that band. A new arrival verifies
  * (exact hash-set jaccard, the batch family's verify) against its
  * band's state only — the stream-side twin of the banded candidate
  * equi-join — and emits a pair per verified partner.
  *
  * stream == batch by construction: the transform is one
  * DataFrame-in/Dataset-out function running identically under batch
  * execution (state starts empty, one "micro-batch") and under
  * Structured Streaming (state persists across micro-batches). The
  * batch run IS the oracle-checked `w_neardup_pairs` query below, and
  * StreamNearDupSpec replays the same corpus through a MemoryStream in
  * several micro-batches asserting the emitted pair set is identical
  * when arrival order follows doc_id order.
  *
  * Scale shape: per-band state is the inherent cost of an online LSH
  * index — bounded by `maxPerBand` per band, and (opt-in) AGED by
  * event time via [[Aging]]: entries older than the horizon behind an
  * arriving row are evicted before it verifies, and under streaming
  * the band KEY's whole state is removed by `EventTimeTimeout` once
  * the watermark passes its newest entry's horizon — so total state is
  * bounded by the horizon's content, not the stream's lifetime
  * (aging defaults OFF so the oracle-checked batch replays and the
  * unbounded-window equivalence specs are unchanged). The shuffle is
  * one exchange on the
  * band key per micro-batch; near-dup bands are small by construction
  * (a band shared by many documents means those documents minhash-
  * collide, i.e. they ARE near-dups and the emitted pairs are true
  * output), so state skew follows true-duplicate skew, exactly like
  * the batch family's banded joins. A pair sharing k bands is emitted
  * k times (once per band — the per-band processors are independent);
  * consumers dedupe, as `w_neardup_pairs` does with one `distinct()`.
  *
  * Semantics note (arrival vs id order): pairs are (earlier arrival,
  * later arrival). Under streaming, "earlier" is micro-batch order
  * with doc_id order inside a batch (arrivals are sorted before
  * processing, making replays deterministic); under batch execution
  * everything is one batch, so pairs come out (lower id, higher id) —
  * the batch family's orientation. */
object NearDup {

  /** Opt-in event-time aging for the online indexes. `ts` is a
    * TimestampType event-time column of the input; `horizonMs` is the
    * retained window: an arriving row pairs only against earlier
    * arrivals whose event time is within `horizonMs` behind its own,
    * and older entries are evicted from band state as it verifies.
    * Under streaming the input MUST carry a watermark on `ts` (pass
    * the watermarked column through — aging switches the state
    * machine to `GroupStateTimeout.EventTimeTimeout`, which Spark
    * only admits with a watermark), and idle band KEYS are removed
    * outright once the watermark passes their newest entry's horizon
    * — the growth the per-entry eviction alone cannot stop, since an
    * idle band's processor never runs again. Semantics are identical
    * under batch execution (where the timeout machinery is inert and
    * the per-entry eviction alone decides), so stream == batch holds
    * on the retained window exactly as it does unaged on the full
    * history — StreamNearDupSpec pins both. Rows whose `ts` is NULL
    * are exempt from HORIZON eviction only: they index and pair like
    * unaged entries (they carry no event time to age by), but a
    * whole-key EventTimeTimeout still removes them with the band's
    * state, and until then they count against `maxPerBand` as
    * permanent residents (in aged runs nothing else bounds them) —
    * supply a non-null `ts` for every row that should age. The cycle
    * itself lives in ONE place, [[AgedBand.process]], shared by all
    * six online processors. */
  /** Event-time aging config. `lateness` is only consulted by
    * processors that must RE-declare the watermark themselves because
    * their prep severs event-time propagation (a typed MapElements
    * drops the watermark tag — see [[semDedupOnline]]); the banded
    * processors' pure-column prep lets the caller's source watermark
    * flow through and ignore it. */
  case class Aging(ts: Column, horizonMs: Long,
      lateness: String = "10 seconds") {
    require(horizonMs > 0, s"aging horizon must be positive, got $horizonMs")
  }

  /** Event-time millis of a row's (nullable) ts — Long.MinValue when
    * absent, which sorts unaged rows exactly where the pre-aging
    * id-only sort put them. */
  private def tsMs(t: java.sql.Timestamp): Long =
    if (t == null) Long.MinValue else t.getTime

  private def noTs: Column = lit(null).cast("timestamp")

  /** The state-timeout config an aged run needs: EventTimeTimeout only
    * under streaming WITH aging (batch timeouts never fire, and Spark
    * rejects the config without a watermark — which only a streaming
    * plan can carry). */
  private def timeoutConf(src: DataFrame, aging: Option[Aging]): GroupStateTimeout =
    if (aging.isDefined && src.isStreaming) GroupStateTimeout.EventTimeTimeout
    else GroupStateTimeout.NoTimeout

  case class BandDoc(band: String, doc_id: Long, xs: Array[Long],
    ts: java.sql.Timestamp)
  case class DocSig(id: Long, xs: Array[Long], ts: Long = Long.MinValue)
    extends AgedBand.Entry
  case class BandState(docs: List[DocSig])
  case class NearPair(id_a: Long, id_b: Long, sim: Double)

  /** Exact jaccard of two SORTED distinct hash arrays (two-pointer
    * merge) — the executor-side twin of [[graft.ops.Dedup.jaccard]]'s
    * column form, same value on the same sets. */
  private[streaming] def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Documents prepared for the online index: in-row minhash
    * signatures (gramless docs dropped, exactly as the batch family
    * drops them — they can never pair), gram-hash sets sorted for the
    * two-pointer verify, one row per (band key, doc). */
  def bandedDocs(
      docs: DataFrame, id: Column, text: Column,
      h: Int = 32, b: Int = 16, ts: Column = noTs): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    graft.ops.Dedup.minhashSignatures(docs, id, text, h, keep = Seq(ts.as("ts")))
      .withColumn("xs", sort_array(col("xs")))
      .select(
        explode(array(graft.ops.Dedup.minhashBandKeys(h, b): _*)).as("band"),
        col("id").as("doc_id"), col("xs"), col("ts"))
      .as[BandDoc]
  }

  private def processBand(threshold: Double, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      band: String, rows: Iterator[BandDoc],
      state: GroupState[BandState]): Iterator[NearPair] =
    AgedBand.process(state, rows, (d: BandDoc) => tsMs(d.ts), (d: BandDoc) => d.doc_id,
      state.getOption.map(_.docs).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      (seen, d) => seen.iterator
        .map(p => NearPair(p.id, d.doc_id, jaccardSorted(p.xs, d.xs)))
        .filter(_.sim >= threshold),
      (d, dts) => DocSig(d.doc_id, d.xs, dts),
      seen => state.update(BandState(seen)))

  /** Default batch-mode index-size cap: 32 GB of estimated state on a
    * 128 GiB local heap leaves the executor threads their working
    * memory; past it the run was headed for an opaque OOM/GC collapse
    * anyway — fail with the actionable message instead. */
  val DefaultMaxIndexBytes: Long = 32L << 30

  /** Loud heap guard for BATCH execution of the online indexes: under
    * batch, every band's state is simultaneously live in ONE JVM
    * (streaming holds it in the per-executor state store — the
    * deployment this operator exists for), so an unbounded corpus
    * turns into an opaque OOM. Estimate the stored bytes (each doc's
    * payload is kept once per band, plus per-entry object overhead)
    * and refuse loudly over the cap, mirroring the blocklist guard in
    * [[buildBlocklistIndex]]. Streaming inputs skip the check — the
    * estimate is a batch aggregate, and bounded state is the state
    * store's + `maxPerBand`'s job there. */
  private def requireIndexFits[T](
      kind: String, payloadUnits: Column, banded: Dataset[T],
      maxIndexBytes: Long): Dataset[T] =
    if (banded.isStreaming) banded
    else {
      // MATERIALIZE the banded frame once (localCheckpoint lease keyed
      // by the operator kind) and run both the estimate and the state
      // pass off the materialized rows: the guard is an eager
      // aggregate, and without the lease the whole fingerprint/banding
      // expression tree evaluated TWICE per batch run — once for the
      // estimate, once again under the stateful exchange (guide §1.2:
      // don't compute things twice). Values are unchanged — the lease
      // only caches the exact frame both passes read.
      val mat = graft.ops.Checkpoints.lease(s"guard:$kind", banded.toDF())
        .as[T](banded.encoder)
      // one state entry per (band, doc) row of the banded frame: its
      // payload array (8 B/element) plus ~64 B of per-entry object +
      // cons-cell overhead
      val est = mat.toDF().agg(
          coalesce(sum(payloadUnits), lit(0L)).cast("long"),
          count(lit(1))).head()
      val bytes = 8L * est.getLong(0) + 64L * est.getLong(1)
      require(bytes <= maxIndexBytes,
        s"batch-mode online $kind index would hold ~$bytes bytes of band state " +
          s"in one JVM (> $maxIndexBytes): bound it with maxPerBand, raise " +
          "maxIndexBytes explicitly, or run the corpus through the batch dedup " +
          "family / a streaming deployment with a state store")
      mat
    }

  /** Verified near-dup pairs of `docs` against everything that arrived
    * before them (and earlier rows of the same micro-batch) — one
    * emission per SHARED BAND; dedupe downstream. Runs on a streaming
    * OR batch DataFrame unchanged; batch runs are heap-guarded (see
    * [[requireIndexFits]]). */
  def nearDupPairs(
      docs: DataFrame, id: Column, text: Column, threshold: Double,
      maxPerBand: Int = Int.MaxValue, h: Int = 32, b: Int = 16,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[NearPair] = {
    import docs.sparkSession.implicits._
    val banded = requireIndexFits("near-dup", size(col("xs")).cast("long"),
      bandedDocs(docs, id, text, h, b, aging.map(_.ts).getOrElse(noTs)),
      maxIndexBytes)
    banded
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(docs, aging))(
        processBand(threshold, maxPerBand,
          aging.map(_.horizonMs).getOrElse(0L), docs.isStreaming))
  }

  /** An arrival that near-dup'd something earlier. */
  case class DroppedDoc(doc_id: Long)

  private def processBandFirstWins(threshold: Double, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      band: String, rows: Iterator[BandDoc],
      state: GroupState[BandState]): Iterator[DroppedDoc] =
    AgedBand.process(state, rows, (d: BandDoc) => tsMs(d.ts), (d: BandDoc) => d.doc_id,
      state.getOption.map(_.docs).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      // drop verdict only — the shared cycle inserts REGARDLESS of it:
      // "earlier" means any prior arrival, so a dropped doc still
      // shadows its own later dups and the decision replays in one SQL
      // pass (dropped = later element of any verified pair)
      (seen, d) =>
        if (seen.exists(p => jaccardSorted(p.xs, d.xs) >= threshold))
          Iterator.single(DroppedDoc(d.doc_id))
        else Iterator.empty,
      (d, dts) => DocSig(d.doc_id, d.xs, dts),
      seen => state.update(BandState(seen)))

  /** Online DEDUP-KEEP-FIRST evidence: the ids of arrivals that verify
    * as near-dups of ANY earlier arrival (per shared band — dedupe
    * downstream), over the same banded index as [[nearDupPairs]].
    * Survivors = arrivals minus these ids: under batch execution
    * that's one anti-join (`w_corpus`); a streaming deployment
    * subtracts at the sink, since the keep/drop verdict must AND
    * across a doc's bands and a second stateful aggregation in the
    * same query is not the streaming engine's contract. Batch runs
    * are heap-guarded like the pair form. */
  def droppedByIndex(
      docs: DataFrame, id: Column, text: Column, threshold: Double,
      maxPerBand: Int = Int.MaxValue, h: Int = 32, b: Int = 16,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[DroppedDoc] = {
    import docs.sparkSession.implicits._
    val banded = requireIndexFits("dedup-first", size(col("xs")).cast("long"),
      bandedDocs(docs, id, text, h, b, aging.map(_.ts).getOrElse(noTs)),
      maxIndexBytes)
    banded
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(docs, aging))(
        processBandFirstWins(threshold, maxPerBand,
          aging.map(_.horizonMs).getOrElse(0L), docs.isStreaming))
  }

  // ---- Image form: the online perceptual-hash index ----------------

  case class BandImg(band: String, media_id: Long, bands: Array[Int],
    ts: java.sql.Timestamp)
  case class ImgSig(id: Long, bands: Array[Int], ts: Long = Long.MinValue)
    extends AgedBand.Entry
  case class ImgBandState(imgs: List[ImgSig])
  case class ImgPair(id_a: Long, id_b: Long, hamming: Int)

  private def hammingBands(a: Array[Int], b: Array[Int]): Int = {
    var h = 0
    var i = 0
    while (i < a.length) { h += Integer.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** Arriving images exploded to their 8 perceptual-hash band keys
    * (`idx:value` — the same stub dHash bands `mm_phash_pairs`
    * computes, reusing its verbatim SQL as Spark exprs). */
  def bandedImages(media: DataFrame, ts: Column = noTs): Dataset[BandImg] = {
    import media.sparkSession.implicits._
    val withBands = media.filter(col("kind") === "image")
      .select(col("media_id"), decode(col("content"), "UTF-8").as("__txt"),
        ts.as("ts"))
      .withColumn("__len", length(col("__txt")))
      .filter(col("__len") >= 1)
      .withColumn("bands",
        array(graft.ops.Multimodal.stubBandExprs("__txt", "__len").map(expr): _*))
    withBands
      .select(posexplode(col("bands")).as(Seq("__idx", "__val")),
        col("media_id"), col("bands"), col("ts"))
      .select(concat(col("__idx").cast("string"), lit(":"),
          col("__val").cast("string")).as("band"),
        col("media_id"), col("bands"), col("ts"))
      .as[BandImg]
  }

  private def processImgBand(maxHamming: Int, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      band: String, rows: Iterator[BandImg],
      state: GroupState[ImgBandState]): Iterator[ImgPair] =
    AgedBand.process(state, rows, (d: BandImg) => tsMs(d.ts), (d: BandImg) => d.media_id,
      state.getOption.map(_.imgs).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      (seen, d) => seen.iterator
        .map(p => ImgPair(p.id, d.media_id, hammingBands(p.bands, d.bands)))
        .filter(_.hamming <= maxHamming),
      (d, dts) => ImgSig(d.media_id, d.bands, dts),
      seen => state.update(ImgBandState(seen)))

  /** Online image near-dup pairs: the perceptual-hash twin of
    * [[nearDupPairs]] — arriving images verify their exact hamming
    * distance against every earlier arrival sharing a band (pigeonhole
    * completeness at `maxHamming <= 7` with 8 bands, exactly the
    * batch operator's argument). Runs on a streaming OR batch
    * DataFrame unchanged; the batch form IS `mm_phash_pairs`' pair
    * set, so `w_phash` shares that oracle's shape verbatim. */
  def imageNearDupPairs(
      media: DataFrame, maxHamming: Int,
      maxPerBand: Int = Int.MaxValue,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[ImgPair] =
    bandedFingerprintPairs(
      bandedImages(media, aging.map(_.ts).getOrElse(noTs)), "image phash",
      maxHamming, maxPerBand, maxIndexBytes,
      timeoutConf(media, aging),
      aging.map(_.horizonMs).getOrElse(0L), media.isStreaming)

  /** Arriving audio exploded to its 8 fingerprint band keys — the
    * audio twin of [[bandedImages]] over
    * [[graft.ops.Multimodal.audioBandExprs]]'s energy-delta bands. */
  def bandedAudio(media: DataFrame, ts: Column = noTs): Dataset[BandImg] = {
    import media.sparkSession.implicits._
    val withBands = media.filter(col("kind") === "audio")
      .select(col("media_id"), decode(col("content"), "UTF-8").as("__txt"),
        ts.as("ts"))
      .withColumn("__len", length(col("__txt")))
      .filter(col("__len") >= 1)
      .withColumn("bands",
        array(graft.ops.Multimodal.audioBandExprs("__txt", "__len").map(expr): _*))
    withBands
      .select(posexplode(col("bands")).as(Seq("__idx", "__val")),
        col("media_id"), col("bands"), col("ts"))
      .select(concat(col("__idx").cast("string"), lit(":"),
          col("__val").cast("string")).as("band"),
        col("media_id"), col("bands"), col("ts"))
      .as[BandImg]
  }

  /** Online audio near-dup pairs over the banded energy-delta
    * fingerprint — same state machine, guard, and completeness
    * argument as [[imageNearDupPairs]]; the batch form IS
    * `mm_audio_pairs`' pair set, so `w_audio` shares that oracle. */
  def audioNearDupPairs(
      media: DataFrame, maxHamming: Int,
      maxPerBand: Int = Int.MaxValue,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[ImgPair] =
    bandedFingerprintPairs(
      bandedAudio(media, aging.map(_.ts).getOrElse(noTs)), "audio fingerprint",
      maxHamming, maxPerBand, maxIndexBytes,
      timeoutConf(media, aging),
      aging.map(_.horizonMs).getOrElse(0L), media.isStreaming)

  /** The shared online banded-fingerprint index: heap-guarded, one
    * band-key exchange into flatMapGroupsWithState, every arrival
    * verified against earlier same-band arrivals. */
  private def bandedFingerprintPairs(
      banded: Dataset[BandImg], what: String, maxHamming: Int,
      maxPerBand: Int, maxIndexBytes: Long,
      timeout: GroupStateTimeout, horizonMs: Long,
      streaming: Boolean): Dataset[ImgPair] = {
    import banded.sparkSession.implicits._
    val mat = requireIndexFits(what,
      size(col("bands")).cast("long"), banded, maxIndexBytes)
    val process: (String, Iterator[BandImg], GroupState[ImgBandState]) => Iterator[ImgPair] =
      processImgBand(maxHamming, maxPerBand, horizonMs, streaming)
    mat
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(process)
  }

  // ---- Video form: the online shared-frame index -------------------

  case class BandVid(fh: String, media_id: Long, fhs: Array[String],
    ts: java.sql.Timestamp)
  case class VidSig(id: Long, fhs: Array[String], ts: Long = Long.MinValue)
    extends AgedBand.Entry
  case class VidBandState(vids: List[VidSig])
  case class VidPair(id_a: Long, id_b: Long, n_shared: Long)

  /** Intersection size of two SORTED distinct string arrays
    * (two-pointer — the executor-side twin of the oracle's
    * count-over-equi-join on DISTINCT (id, fh) postings). */
  private[streaming] def sharedSorted(a: Array[String], b: Array[String]): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Arriving videos exploded to their sampled-frame-hash postings —
    * the video member of the banded family, with the frame hash AS the
    * band key (exact-match bands, so the state index is the online
    * mirror of `mm_video_pairs`' postings join). Each posting carries
    * the video's full sorted distinct frame-hash set, exactly like the
    * text postings carry signatures: the >= `minShared` verify runs
    * in-state from the two sets, position-independent. */
  def bandedVideos(media: DataFrame, ts: Column = noTs): Dataset[BandVid] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), decode(col("content"), "UTF-8").as("__txt"),
        col("n_frames"), ts.as("ts"))
      .withColumn("__len", length(col("__txt")))
      .filter(col("__len") >= 1)
      .withColumn("fl", greatest((col("__len") / col("n_frames")).cast("int"), lit(1)))
      .withColumn("fhs", expr(
        """sort_array(array_distinct(filter(
             transform(sequence(0, n_frames - 1, 3),
               x -> CASE WHEN length(substring(__txt, x * fl + 1, fl)) > 0
                         THEN md5(substring(__txt, x * fl + 1, fl)) END),
             h -> h IS NOT NULL)))"""))
      .select(explode(col("fhs")).as("fh"), col("media_id"), col("fhs"), col("ts"))
      .as[BandVid]
  }

  private def processVidBand(minShared: Int, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      fh: String, rows: Iterator[BandVid],
      state: GroupState[VidBandState]): Iterator[VidPair] =
    AgedBand.process(state, rows, (d: BandVid) => tsMs(d.ts), (d: BandVid) => d.media_id,
      state.getOption.map(_.vids).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      (seen, d) => seen.iterator
        .map(p => VidPair(p.id, d.media_id, sharedSorted(p.fhs, d.fhs)))
        .filter(_.n_shared >= minShared),
      (d, dts) => VidSig(d.media_id, d.fhs, dts),
      seen => state.update(VidBandState(seen)))

  /** Online video near-dup pairs by shared sampled frames — the video
    * member of the online index family (text / vector / image / audio
    * / video now all have one): every arriving video verifies its
    * full distinct-frame intersection against every earlier arrival
    * sharing at least one frame hash (a pair with n_shared >= 1 must
    * meet in that frame's state group — completeness is exact-match
    * trivial, no pigeonhole needed), emitting one pair per shared
    * frame; consumers dedupe with `distinct()` (every emission of a
    * pair carries the identical full-set count). Runs on a streaming
    * OR batch DataFrame unchanged; the batch form IS
    * `mm_video_pairs`' pair set, so `w_video` shares that oracle's
    * shape. */
  def videoNearDupPairs(
      media: DataFrame, minShared: Int,
      maxPerBand: Int = Int.MaxValue,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[VidPair] = {
    import media.sparkSession.implicits._
    // stored payload per (frame-hash, video) row: the fhs string array
    // (32-char md5s — 4 units of 8 B each per hash ≈ its UTF-16 char
    // bytes) plus the per-entry overhead the shared guard adds
    val banded = requireIndexFits("video shared-frame",
      size(col("fhs")).cast("long") * lit(4L),
      bandedVideos(media, aging.map(_.ts).getOrElse(noTs)), maxIndexBytes)
    val process: (String, Iterator[BandVid], GroupState[VidBandState]) => Iterator[VidPair] =
      processVidBand(minShared, maxPerBand,
        aging.map(_.horizonMs).getOrElse(0L), media.isStreaming)
    banded
      .groupByKey(_.fh)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(media, aging))(process)
  }

  // ---- Composed online media pipeline ------------------------------

  case class MediaPosting(band: String, media_id: Long, kind: String,
    bands: Array[Int], fhs: Array[String], ts: java.sql.Timestamp)
  case class MediaSig(id: Long, bands: Array[Int], fhs: Array[String],
    ts: Long = Long.MinValue) extends AgedBand.Entry
  case class MediaBandState(items: List[MediaSig])
  case class DroppedMedia(media_id: Long)

  /** ALL media kinds' postings in ONE kind-prefixed band key space —
    * image dHash bands (`i:`), audio energy-delta bands (`a:`), video
    * frame hashes (`v:`). Prefixes keep the kinds' value spaces
    * disjoint, so one state machine serves the whole family: a band
    * group only ever holds entries of one kind, and the arriving
    * row's kind picks the verify (hamming for the fingerprint kinds,
    * distinct-frame intersection for video). */
  def bandedMedia(media: DataFrame, ts: Column = noTs): Dataset[MediaPosting] = {
    import media.sparkSession.implicits._
    val noFhs = typedLit(Array.empty[String])
    val noBands = typedLit(Array.empty[Int])
    val img = bandedImages(media, ts).toDF()
      .select(concat(lit("i:"), col("band")).as("band"), col("media_id"),
        lit("image").as("kind"), col("bands"), noFhs.as("fhs"), col("ts"))
    val aud = bandedAudio(media, ts).toDF()
      .select(concat(lit("a:"), col("band")).as("band"), col("media_id"),
        lit("audio").as("kind"), col("bands"), noFhs.as("fhs"), col("ts"))
    val vid = bandedVideos(media, ts).toDF()
      .select(concat(lit("v:"), col("fh")).as("band"), col("media_id"),
        lit("video").as("kind"), noBands.as("bands"), col("fhs"), col("ts"))
    img.unionByName(aud).unionByName(vid).as[MediaPosting]
  }

  private def processMediaBand(
      maxHamming: Int, minShared: Int, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      band: String, rows: Iterator[MediaPosting],
      state: GroupState[MediaBandState]): Iterator[DroppedMedia] =
    AgedBand.process(state, rows, (d: MediaPosting) => tsMs(d.ts), (d: MediaPosting) => d.media_id,
      state.getOption.map(_.items).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      // the arriving row's kind picks the verify (a band group only
      // ever holds one kind — the key prefixes keep them disjoint);
      // drop verdict only, the shared cycle inserts regardless (see
      // processBandFirstWins)
      (seen, d) => {
        val dropped =
          if (d.kind == "video") seen.exists(p => sharedSorted(p.fhs, d.fhs) >= minShared)
          else seen.exists(p => hammingBands(p.bands, d.bands) <= maxHamming)
        if (dropped) Iterator.single(DroppedMedia(d.media_id)) else Iterator.empty
      },
      (d, dts) => MediaSig(d.media_id, d.bands, d.fhs, dts),
      seen => state.update(MediaBandState(seen)))

  /** Online COMPOSED media dedup evidence — the media twin of
    * [[droppedByIndex]] and the online counterpart of the batch
    * `pipe_media` build: one unified banded state judges every
    * arriving medium against all earlier arrivals of its kind
    * (image/audio by banded-fingerprint hamming, video by shared
    * sampled frames), emitting the dominated ids. Survivors =
    * arrivals minus these ids (one anti-join under batch execution;
    * a streaming deployment subtracts at the sink, as `w_corpus`
    * documents). ONE stateful exchange covers the whole family —
    * exactly the property that makes the composed pipeline runnable
    * as a single streaming query, where chaining three per-kind
    * stateful operators would not be. */
  def mediaDroppedByIndex(
      media: DataFrame, maxHamming: Int = 6, minShared: Int = 2,
      maxPerBand: Int = Int.MaxValue,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[DroppedMedia] = {
    import media.sparkSession.implicits._
    val banded = requireIndexFits("composed media",
      size(col("bands")).cast("long") + size(col("fhs")).cast("long") * lit(4L),
      bandedMedia(media, aging.map(_.ts).getOrElse(noTs)), maxIndexBytes)
    val process: (String, Iterator[MediaPosting], GroupState[MediaBandState]) => Iterator[DroppedMedia] =
      processMediaBand(maxHamming, minShared, maxPerBand,
        aging.map(_.horizonMs).getOrElse(0L), media.isStreaming)
    banded
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(media, aging))(process)
  }

  // ---- Embedding form: the online hyperplane-LSH index ------------

  case class BandVec(bucket: Int, vec_id: Long, v: Array[Double], norm: Double,
    ts: java.sql.Timestamp)
  case class VecSig(id: Long, v: Array[Double], norm: Double,
    ts: Long = Long.MinValue) extends AgedBand.Entry
  case class VecBandState(vecs: List[VecSig])
  case class VecPair(id_a: Long, id_b: Long, cos: Double)

  /** Sequential dot product in index order — the executor-side twin of
    * the codegen DotProduct expression AND DuckDB's list_dot_product
    * (all three accumulate left-to-right, so the doubles agree
    * bitwise). */
  private[streaming] def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Embeddings prepared for the online index: double vectors with
    * precomputed norms, zero-norm rows dropped (cosine is 0/0 = NaN —
    * they never pair, the batch family's explicit gate), one row per
    * (hyperplane band bucket, vector) over the family's shared LSH
    * (bands=8, r=8). Pass `dim` when known (production: the corpus
    * dimension is fixed) to get the fused constant-plane expression; a
    * STREAMING input without `dim` takes the probe-free declarative
    * form instead — `bandBucketsProbed`'s limit-1 dimension probe is a
    * batch job, which a streaming plan must not run at construction —
    * bit-identical buckets by the fused expression's equivalence spec. */
  def bandedVecs(
      embeddings: DataFrame, id: Column, vec: Column,
      dim: Option[Int] = None, ts: Column = noTs): Dataset[BandVec] = {
    import embeddings.sparkSession.implicits._
    val prepped = embeddings
      .select(id.as("vec_id"), graft.ops.Similarity.asDouble(vec).as("v"),
        ts.as("ts"))
      .withColumn("norm", graft.ops.Similarity.l2norm(col("v")))
      .filter(col("norm") > 0)
    val buckets = dim match {
      case Some(k) =>
        graft.ops.Similarity.hyperplaneBandBucketsFixed(col("v"), k, bands = 8, r = 8)
      case None if embeddings.isStreaming =>
        graft.ops.Similarity.hyperplaneBandBuckets(col("v"), bands = 8, r = 8)
      case None =>
        graft.ops.Similarity.bandBucketsProbed(prepped, col("v"), bands = 8, r = 8)
    }
    prepped.select(explode(buckets).as("bucket"),
        col("vec_id"), col("v"), col("norm"), col("ts"))
      .as[BandVec]
  }

  private def processVecBand(threshold: Double, maxPerBand: Int,
      horizonMs: Long, streaming: Boolean)(
      bucket: Int, rows: Iterator[BandVec],
      state: GroupState[VecBandState]): Iterator[VecPair] =
    AgedBand.process(state, rows, (d: BandVec) => tsMs(d.ts), (d: BandVec) => d.vec_id,
      state.getOption.map(_.vecs).getOrElse(Nil),
      horizonMs, maxPerBand, streaming)(
      (seen, d) => seen.iterator
        .map(p => VecPair(p.id, d.vec_id, dotSeq(p.v, d.v) / (p.norm * d.norm)))
        .filter(_.cos >= threshold),
      (d, dts) => VecSig(d.vec_id, d.v, d.norm, dts),
      seen => state.update(VecBandState(seen)))

  /** Verified cosine near-dup pairs of arriving embeddings against
    * everything that arrived before them — the vector twin of
    * [[nearDupPairs]], one emission per shared band bucket. Runs on a
    * streaming OR batch DataFrame unchanged. */
  def embedNearDupPairs(
      embeddings: DataFrame, id: Column, vec: Column, threshold: Double,
      maxPerBand: Int = Int.MaxValue, dim: Option[Int] = None,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[VecPair] = {
    import embeddings.sparkSession.implicits._
    val banded = requireIndexFits("embedding near-dup",
      size(col("v")).cast("long"),
      bandedVecs(embeddings, id, vec, dim, aging.map(_.ts).getOrElse(noTs)),
      maxIndexBytes)
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(embeddings, aging))(
        processVecBand(threshold, maxPerBand,
          aging.map(_.horizonMs).getOrElse(0L), embeddings.isStreaming))
  }

  // ---- Online SemDeDup: frozen-quantizer cell index -----------------

  /** One frozen centroid: label + vector + norm, cells ascending in
    * the collected array so the strictly-greater argmax keeps the
    * lowest cell on ties (the trained quantizer's tie rule). */
  case class CentEntry(label: Long, cv: Array[Double], cn: Double) extends Serializable
  case class CellVec(cell: Long, vec_id: Long, v: Array[Double], norm: Double,
    ts: java.sql.Timestamp)
  case class CellSurvivor(vec_id: Long, cell: Long)

  /** Collect a trained single-row centroid frame
    * ([[graft.ops.Similarity.kmeansCents]]'s output, or its reloaded
    * parquet artifact) to the driver for broadcast into the stream.
    * Loud cap first — the payload is nlist x dim doubles, bounded by
    * construction (a quantizer is trained, not corpus-sized), and a
    * mis-wired corpus-sized frame must fail here, not OOM the driver. */
  def collectCentroids(cents: DataFrame, maxCents: Int = 1 << 20): Array[CentEntry] = {
    // ONE action: a count() before the collect() would execute the
    // whole Lloyd training subtree twice when `cents` is the un-leased
    // trained frame. The cap check runs on the collected length — the
    // payload it bounds is exactly what was just materialized, and the
    // single-ROW frame (one array of nlist cells) can't meaningfully
    // exceed it without having OOM'd the row first; the guard exists
    // to fail a mis-wired corpus-sized frame loudly before BROADCAST.
    val collected = cents.select(explode(col("cents")).as("c"))
      .select(col("c.c_label"), col("c.cv"), col("c.cn"))
      .collect()
    require(collected.nonEmpty,
      "online SemDeDup needs a non-degenerate trained quantizer")
    require(collected.length <= maxCents,
      s"online SemDeDup centroid frame holds ${collected.length} cells " +
        s"(> $maxCents): that is not a trained quantizer — train nlist " +
        "cells, not one per row")
    collected
      .map(r => CentEntry(r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_.label)
  }

  /** The executor-side twin of the in-row assignment fold
    * ([[graft.ops.Similarity.withNearestCell]]): strictly-greater
    * argmax over cells ascending, scores via [[dotSeq]] — all three
    * forms (Catalyst fold, this loop, the oracle's row_number) agree
    * bitwise. */
  private[streaming] def assignCellJvm(v: Array[Double], cents: Array[CentEntry]): Long = {
    var best = Double.NegativeInfinity
    var cell = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val s = dotSeq(v, c.cv) / c.cn
      if (s > best) { best = s; cell = c.label }
      i += 1
    }
    cell
  }

  private def processSemDedupCell(threshold: Double, maxPerCell: Int,
      horizonMs: Long, streaming: Boolean)(
      cell: Long, rows: Iterator[CellVec],
      state: GroupState[VecBandState]): Iterator[CellSurvivor] =
    AgedBand.process(state, rows, (d: CellVec) => tsMs(d.ts), (d: CellVec) => d.vec_id,
      state.getOption.map(_.vecs).getOrElse(Nil),
      horizonMs, maxPerCell, streaming)(
      // survivor iff NO retained cell-mate reaches the threshold. A
      // zero-norm arrival scores NaN against everything and NaN >= t
      // is false on the JVM, so it neither falls nor dominates — the
      // family's gate, with no explicit norm filter needed here
      (seen, d) => if (seen.exists(p =>
          dotSeq(p.v, d.v) / (p.norm * d.norm) >= threshold)) Iterator.empty
        else Iterator.single(CellSurvivor(d.vec_id, cell)),
      (d, dts) => VecSig(d.vec_id, d.v, d.norm, dts),
      seen => state.update(VecBandState(seen)))

  /** ONLINE SemDeDup — the streaming form of
    * [[graft.ops.Dedup.semDedupSurvivors]]: the quantizer is trained
    * offline and FROZEN (`cents`, collected behind
    * [[collectCentroids]]'s cap and shipped in the closure); each
    * arriving vector is assigned its cell executor-side and survives
    * iff no retained cell-mate that arrived before it reaches
    * `threshold` cosine. The cell index retains EVERY arrival
    * (dominance by a vector that was itself dropped still drops you —
    * the paper's rule, and what lets the batch replay run under
    * dd_semdedup's oracle verbatim when arrival order is id order).
    * State is bounded by maxPerCell and, with `aging`, the event-time
    * horizon + whole-key timeout — the same [[AgedBand]] cycle every
    * online index runs. Runs on a streaming OR batch frame unchanged;
    * batch runs are heap-guarded.
    *
    * Watermark: the executor-side cell assignment is a typed
    * MapElements, which severs Spark's event-time propagation (a
    * source-side withWatermark does NOT survive it), so under
    * streaming WITH aging this operator re-declares the watermark on
    * its own post-map `ts` from [[Aging.lateness]] — callers set the
    * horizon and lateness here, not on the source. */
  def semDedupOnline(
      embeddings: DataFrame, id: Column, vec: Column,
      cents: Array[CentEntry], threshold: Double,
      maxPerCell: Int = Int.MaxValue,
      maxIndexBytes: Long = DefaultMaxIndexBytes,
      aging: Option[Aging] = None): Dataset[CellSurvivor] = {
    import embeddings.sparkSession.implicits._
    require(cents.nonEmpty,
      "online SemDeDup needs a non-degenerate trained quantizer")
    val ts = aging.map(_.ts).getOrElse(noTs)
    val prepped = requireIndexFits("SemDeDup cell",
      size(col("v")).cast("long"),
      embeddings
        .select(id.as("vec_id"), graft.ops.Similarity.asDouble(vec).as("v"),
          ts.as("ts"))
        .withColumn("norm", graft.ops.Similarity.l2norm(col("v"))),
      maxIndexBytes)
    val assigned = prepped
      .select(col("vec_id"), col("v"), col("norm"), col("ts"))
      .as[(Long, Array[Double], Double, java.sql.Timestamp)]
      .map { case (vid, v, nrm, t) =>
        CellVec(assignCellJvm(v, cents), vid, v, nrm, t) }
    val watermarked =
      if (embeddings.isStreaming && aging.isDefined)
        assigned.withWatermark("ts", aging.get.lateness)
      else assigned
    watermarked
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(embeddings, aging))(
        processSemDedupCell(threshold, maxPerCell,
          aging.map(_.horizonMs).getOrElse(0L), embeddings.isStreaming))
  }

  // ---- Online decontamination: broadcast blocklist index -----------

  /** A driver-built LSH index of a benchmark/blocklist corpus:
    * band key -> the gram-hash sets of the blocklist docs in that
    * band. Bounded by blocklist size (benchmarks are thousands of
    * documents; the guard enforces the same payload cap as the batch
    * form's broadcast hint), shipped to executors once, probed per
    * arriving row with ZERO stateful operators — which is what makes
    * online decontamination watermark-free: unlike the near-dup index,
    * the reference set never grows with the stream. */
  case class BlocklistIndex(
      bands: Map[String, Array[DocSig]], threshold: Double) extends Serializable {
    def contaminated(xs: Array[Long], bandKeys: scala.collection.Seq[String]): Boolean =
      bandKeys.exists { b =>
        bands.get(b).exists(_.exists(p => jaccardSorted(p.xs, xs) >= threshold))
      }
  }

  /** Build the [[BlocklistIndex]] from a BATCH blocklist corpus — the
    * same signature/band stage as the batch family (portable
    * universal-hash grams, 32 slots, 16 bands), collected to the
    * driver. `maxGrams` mirrors [[graft.ops.Dedup.decontaminate]]'s
    * broadcast guard: a corpus-sized "blocklist" must fail loudly here,
    * not OOM the driver. */
  private val blockStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The blocklist's signature frame — the artifact
    * `w_decontaminate_stored` dumps: (id, sorted gram hashes, band
    * keys). Longs and md5 strings — parquet round-trips them
    * exactly. */
  private[streaming] def blocklistSigFrame(
      blocklist: DataFrame, id: Column, text: Column): DataFrame =
    graft.ops.Dedup.minhashSignatures(blocklist, id, text, 32)
      .withColumn("xs", sort_array(col("xs")))
      .select(col("id"), col("xs"),
        array(graft.ops.Dedup.minhashBandKeys(32, 16): _*).as("bands"))

  def buildBlocklistIndex(
      blocklist: DataFrame, id: Column, text: Column, threshold: Double,
      maxGrams: Long = 32L << 20): BlocklistIndex =
    blocklistFromFrame(blocklistSigFrame(blocklist, id, text), threshold, maxGrams)

  /** Collect a signature frame into the driver blocklist index behind
    * the loud cap — a corpus-sized "blocklist" must fail here, not
    * OOM the driver. */
  def blocklistFromFrame(
      sigs: DataFrame, threshold: Double,
      maxGrams: Long = 32L << 20): BlocklistIndex = {
    val totalGrams = sigs.agg(coalesce(sum(size(col("xs"))), lit(0L)))
      .head().getLong(0)
    require(totalGrams <= maxGrams,
      s"blocklist too large to index on the driver: $totalGrams gram hashes > $maxGrams")
    val rows = sigs.collect()
    val byBand = scala.collection.mutable.HashMap.empty[String, List[DocSig]]
    rows.foreach { r =>
      val sig = DocSig(r.getAs[Long]("id"),
        r.getSeq[Long](r.fieldIndex("xs")).toArray)
      r.getSeq[String](r.fieldIndex("bands")).foreach { b =>
        byBand(b) = sig :: byBand.getOrElse(b, Nil)
      }
    }
    BlocklistIndex(byBand.view.mapValues(_.toArray).toMap, threshold)
  }

  /** Append a boolean `out` column — true iff the row's text verifies
    * at the index threshold against NO blocklist document — to a batch
    * OR streaming DataFrame, schema otherwise preserved. The whole
    * check is per-row against the broadcast index: no join, no
    * shuffle, no state — the plan stays a single map stage, so this
    * drops into any streaming ingest pipeline before the sink.
    * Gramless docs (under 3 tokens) have no bands and are always
    * clean, exactly like the batch form (they can never pair). */
  def withOnlineDecontamination(
      docs: DataFrame, text: Column, out: String,
      index: BlocklistIndex): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.BooleanType
    val bIndex = docs.sparkSession.sparkContext.broadcast(index)
    val withSig = docs
      .withColumn("__xs",
        sort_array(graft.functions.TextShingles.hashedWordShingles(text, 3, "uh30")))
      .withColumn("__sig",
        when(size(col("__xs")) > 0,
          graft.functions.MinhashSlots.minhashSlots(col("__xs"), 32)))
      .withColumn("__bands",
        when(size(col("__xs")) > 0,
          array(graft.ops.Dedup.minhashBandKeys(32, 16): _*))
          .otherwise(array()))
    val outSchema = withSig.schema.add(out, BooleanType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withSig.mapPartitions { rows =>
      val idx = bIndex.value
      rows.map { r =>
        val xs = r.getSeq[Long](r.fieldIndex("__xs")).toArray
        val bands = r.getSeq[String](r.fieldIndex("__bands"))
        Row.fromSeq(r.toSeq :+ !idx.contaminated(xs, bands))
      }
    }(enc).drop("__xs", "__sig", "__bands")
  }

  val queries: Seq[QueryDef] = Seq(

    // The online LSH index under batch execution: all documents in one
    // "micro-batch", pairs oriented (lower id, higher id) — which must
    // equal the batch family's verified pair set over the SAME raw
    // corpus (no rep collapse here: the online form sees every member,
    // so the oracle is the uncollapsed pipeline). StreamNearDupSpec
    // asserts the multi-batch streaming run emits this same set.
    QueryDef(
      "w_neardup_pairs",
      (s, d) => {
        import s.implicits._
        nearDupPairs(table(s, d, "documents"), $"doc_id", $"text", 0.5)
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""${graft.ops.Dedup.minhashOracleCtesFrom("documents")}
              SELECT id_a, id_b, sim FROM verified
              WHERE sim >= 0.5 ORDER BY id_a, id_b""")),

    // The AGED online index under batch execution, with a
    // deterministic synthesized event time (ts = epoch 1,000,000 +
    // doc_id seconds, so arrival order == id order) and a 150 s
    // horizon the sf0.01 fixture's pair-gap spread straddles (11
    // verified pairs inside the horizon, 14 evicted before pairing —
    // both eviction verdicts exercised under the oracle's hash
    // compare, not just the spec). Because ts is monotone in id, an
    // entry evicted by an INTERMEDIATE arrival would have been
    // evicted by the pair's own cutoff anyway, so the aged pair set
    // is EXACTLY the unaged set filtered by ts_b - ts_a <= horizon —
    // which is what the oracle replays on the same synthesized ts.
    QueryDef(
      "w_neardup_aged",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"doc_id"))
        nearDupPairs(docs, $"doc_id", $"text", 0.5,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""${graft.ops.Dedup.minhashOracleCtesFrom("documents")}
              SELECT id_a, id_b, sim FROM verified
              WHERE sim >= 0.5
                AND epoch(to_timestamp(1000000 + id_b))
                  - epoch(to_timestamp(1000000 + id_a)) <= 150
              ORDER BY id_a, id_b""")),

    // The online hyperplane-LSH index under batch execution: the
    // UNCOLLAPSED verified cosine pair set (the online form sees every
    // member as it arrives — exact twins pair like any neighbor), which
    // DuckDB replays band-for-band via the family's shared bucket
    // comprehension. StreamNearDupSpec asserts the multi-batch
    // streaming run emits this same set.
    QueryDef(
      "w_embed_neardup",
      (s, d) => {
        import s.implicits._
        embedNearDupPairs(table(s, d, "embeddings"), $"vec_id", $"embedding", 0.4)
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              b AS (
                SELECT vec_id, ${graft.ops.Dedup.embedBucketListSql} AS bkts
                FROM e),
              cand AS (
                SELECT a.vec_id AS id_a, c.vec_id AS id_b
                FROM b a JOIN b c ON a.vec_id < c.vec_id
                WHERE len(list_intersect(a.bkts, c.bkts)) > 0)
              SELECT cand.id_a, cand.id_b,
                     list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
              FROM cand
              JOIN e x ON x.vec_id = cand.id_a
              JOIN e y ON y.vec_id = cand.id_b
              WHERE x.nrm > 0 AND y.nrm > 0
                AND list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4
              ORDER BY id_a, id_b""")),

    // The AGED KEEP-FIRST index under batch execution — the DROP form
    // of w_neardup_aged, covering the first-wins processor clone
    // (semantically distinct from the pair form: insertion happens
    // REGARDLESS of the verdict, so a dropped doc still shadows its
    // own later dups). Under the monotone synthesized ts the aged
    // drop set is EXACTLY "later element of any verified pair with
    // ts_b - ts_a <= horizon": every earlier doc is inserted
    // unconditionally, and it is retained at b's arrival iff its ts
    // clears b's cutoff — which the oracle replays as one gap
    // predicate over the shared verified-pair fragment.
    QueryDef(
      "w_dedup_first_aged",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"doc_id"))
        droppedByIndex(docs, $"doc_id", $"text", 0.5,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"doc_id")
      },
      Some(s"""${graft.ops.Dedup.minhashOracleCtesFrom("documents")}
              SELECT DISTINCT id_b AS doc_id FROM verified
              WHERE sim >= 0.5
                AND epoch(to_timestamp(1000000 + id_b))
                  - epoch(to_timestamp(1000000 + id_a)) <= 150
              ORDER BY doc_id""")),

    // The AGED vector index under batch execution — w_neardup_aged's
    // construction applied to the hyperplane-LSH processor clone (the
    // aging state machine is cloned per processor, so each clone's
    // eviction arithmetic deserves its own oracle coverage): the same
    // synthesized monotone event time (ts = epoch 1,000,000 + vec_id
    // seconds) and 150 s horizon, so the aged pair set is EXACTLY the
    // unaged banded set filtered by ts_b - ts_a <= horizon (monotone
    // ts makes intermediate-arrival eviction coincide with the pair's
    // own cutoff), which the oracle replays on the same ts.
    QueryDef(
      "w_embed_aged",
      (s, d) => {
        import s.implicits._
        val vecs = table(s, d, "embeddings")
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"vec_id"))
        embedNearDupPairs(vecs, $"vec_id", $"embedding", 0.4,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              b AS (
                SELECT vec_id, ${graft.ops.Dedup.embedBucketListSql} AS bkts
                FROM e),
              cand AS (
                SELECT a.vec_id AS id_a, c.vec_id AS id_b
                FROM b a JOIN b c ON a.vec_id < c.vec_id
                WHERE len(list_intersect(a.bkts, c.bkts)) > 0)
              SELECT cand.id_a, cand.id_b,
                     list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
              FROM cand
              JOIN e x ON x.vec_id = cand.id_a
              JOIN e y ON y.vec_id = cand.id_b
              WHERE x.nrm > 0 AND y.nrm > 0
                AND list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4
                AND epoch(to_timestamp(1000000 + cand.id_b))
                  - epoch(to_timestamp(1000000 + cand.id_a)) <= 150
              ORDER BY id_a, id_b""")),

    // ONLINE SemDeDup under batch execution (see semDedupOnline): the
    // quantizer is trained offline (kmeansCents — the same frozen
    // centroid row dd_semdedup_increment admits against), collected
    // behind the loud cap, and the whole corpus streams through the
    // cell index in id order — so the survivor set IS dd_semdedup's
    // and the oracle is shared verbatim (the online index retains
    // every arrival; dominance by a dropped vector still drops you).
    QueryDef(
      "w_semdedup",
      (s, d) => {
        import s.implicits._
        val emb = table(s, d, "embeddings")
        val cents = collectCentroids(graft.ops.Similarity.kmeansCents(
          emb.select($"vec_id", graft.ops.Similarity.asDouble($"embedding").as("v"))))
        semDedupOnline(emb, $"vec_id", $"embedding", cents, 0.4)
          .toDF().orderBy($"vec_id")
      },
      Some(graft.ops.Dedup.semDedupOracle())),

    // The AGED online SemDeDup index: the same synthesized monotone
    // event time the family's aged forms use (ts = epoch 1,000,000 +
    // vec_id seconds, 150 s horizon) — a vector only falls to
    // cell-mates that arrived within the horizon before it, which the
    // shared oracle replays as the id-distance predicate on the
    // dominance join (monotone ts makes per-arrival eviction coincide
    // with the dominator's own cutoff).
    QueryDef(
      "w_semdedup_aged",
      (s, d) => {
        import s.implicits._
        val emb = table(s, d, "embeddings")
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"vec_id"))
        val cents = collectCentroids(graft.ops.Similarity.kmeansCents(
          emb.select($"vec_id", graft.ops.Similarity.asDouble($"embedding").as("v"))))
        semDedupOnline(emb, $"vec_id", $"embedding", cents, 0.4,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().orderBy($"vec_id")
      },
      Some(graft.ops.Dedup.semDedupOracle(
        """AND epoch(to_timestamp(1000000 + x.vec_id))
             - epoch(to_timestamp(1000000 + y.vec_id)) <= 150"""))),

    // Online decontamination under batch execution: the broadcast
    // blocklist index probed per row must reproduce the batch form's
    // survivor set EXACTLY — the oracle IS dd_decontaminate's (same
    // split, same signatures, same bands, same verify), so the
    // driver's hash-compare holds the join-based and index-based
    // plans to bit-equality.
    QueryDef(
      "w_decontaminate",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val docs = table(s, d, "documents").withColumn("__bucket", bucket)
        val training = docs.filter($"__bucket" >= 20).drop("__bucket")
        val benchmark = docs.filter($"__bucket" < 20).drop("__bucket")
        val idx = buildBlocklistIndex(benchmark, $"doc_id", $"text", 0.5)
        withOnlineDecontamination(training, $"text", "__clean", idx)
          .filter($"__clean")
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(graft.ops.Dedup.decontaminateOracleSql)),

    // The durable decontamination cycle: the blocklist's signature
    // frame is WRITTEN to parquet and RELOADED before the driver
    // index is collected — production decontamination serves one
    // benchmark blocklist artifact across every ingest job, and the
    // scrubbing job needs zero knowledge of how it was built (no
    // signature subtree; a plain parquet scan feeds the guard +
    // collect). Longs and md5 strings round-trip exactly, so the
    // oracle is dd_decontaminate's verbatim, like w_decontaminate's.
    QueryDef(
      "w_decontaminate_stored",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val docs = table(s, d, "documents").withColumn("__bucket", bucket)
        val training = docs.filter($"__bucket" >= 20).drop("__bucket")
        val benchmark = docs.filter($"__bucket" < 20).drop("__bucket")
        val root = graft.ops.IndexStore.scratchRoot(s, "blockstore",
          blockStoreSeq.incrementAndGet())
        graft.ops.IndexStore.save(root,
          "blocklist_sigs" -> blocklistSigFrame(benchmark, $"doc_id", $"text"))
        val idx = blocklistFromFrame(
          graft.ops.IndexStore.load(s, root, "blocklist_sigs"), 0.5)
        withOnlineDecontamination(training, $"text", "__clean", idx)
          .filter($"__clean")
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(graft.ops.Dedup.decontaminateOracleSql)),

    // Blocklist TAKEDOWN — the decontamination twin of w_ann_takedown,
    // completing the removal symmetry across the broadcast serving
    // class: the stored blocklist signature artifact is compacted by a
    // benchmark tombstone set (benchmark ids < 100 — "this eval set
    // was retired") before the driver index is collected, so retired
    // benchmark docs provably stop suppressing training docs. The
    // replay is the decontamination oracle with the blocklist side
    // filtered to the surviving benchmark — exactly the compaction
    // contract.
    QueryDef(
      "w_decontaminate_takedown",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val docs = table(s, d, "documents").withColumn("__bucket", bucket)
        val training = docs.filter($"__bucket" >= 20).drop("__bucket")
        val benchmark = docs.filter($"__bucket" < 20).drop("__bucket")
        val root = graft.ops.IndexStore.scratchRoot(s, "blocktakedown",
          blockStoreSeq.incrementAndGet())
        graft.ops.IndexStore.save(root,
          "blocklist_sigs" -> blocklistSigFrame(benchmark, $"doc_id", $"text"))
        graft.ops.IndexStore.compact(s, root, "blocklist_sigs",
          benchmark.filter($"doc_id" < 100).select($"doc_id".as("id")),
          idCol = "id")
        val idx = blocklistFromFrame(
          graft.ops.IndexStore.load(s, root, "blocklist_sigs"), 0.5)
        withOnlineDecontamination(training, $"text", "__clean", idx)
          .filter($"__clean")
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(graft.ops.Dedup.decontaminateOracleSqlFor("doc_id >= 100"))),

    // Blocklist ADD — "a new eval set was released": its signature
    // frame is computed from JUST the new slice and APPENDED to the
    // stored blocklist artifact, then scrubbing runs against the
    // grown blocklist. The md5-bucket space is carved three ways
    // (blocklist < 20, new slice 20-25, training >= 26) so the
    // replay is the decontamination oracle over the whole
    // bucket < 26 blocklist — exactly what append must equal. With
    // w_decontaminate_takedown this closes add/remove symmetry for
    // the blocklist artifact.
    QueryDef(
      "w_decontaminate_add",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val docs = table(s, d, "documents").withColumn("__bucket", bucket)
        val training = docs.filter($"__bucket" >= 26).drop("__bucket")
        val bench1 = docs.filter($"__bucket" < 20).drop("__bucket")
        val bench2 = docs.filter($"__bucket" >= 20 && $"__bucket" < 26)
          .drop("__bucket")
        val root = graft.ops.IndexStore.scratchRoot(s, "blockadd",
          blockStoreSeq.incrementAndGet())
        graft.ops.IndexStore.save(root,
          "blocklist_sigs" -> blocklistSigFrame(bench1, $"doc_id", $"text"))
        graft.ops.IndexStore.save(root, "blocklist_sigs" ->
          graft.ops.IndexStore.load(s, root, "blocklist_sigs")
            .unionByName(blocklistSigFrame(bench2, $"doc_id", $"text")))
        val idx = blocklistFromFrame(
          graft.ops.IndexStore.load(s, root, "blocklist_sigs"), 0.5)
        withOnlineDecontamination(training, $"text", "__clean", idx)
          .filter($"__clean")
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(graft.ops.Dedup.decontaminateOracleSqlSplit(26, 26))),

    // The online image phash index under batch execution: the same
    // replayed-copies corpus and the same pair set as mm_phash_pairs
    // (both emit every verified (earlier, later) pair), so the oracle
    // is that query's naive all-pairs hamming verbatim. StreamPhashSpec
    // asserts the multi-micro-batch streaming run emits this set.
    QueryDef(
      "w_phash",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "image" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        imageNearDupPairs(base.unionByName(replayed), maxHamming = 6)
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = graft.ops.Multimodal.stubBandExprs("text", "len")
          .mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 0 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c ON a.media_id < c.media_id
            WHERE $ham <= 6
            ORDER BY id_a, id_b"""
      }),

    // The AGED online image index — the perceptual member of the aged
    // family (text pair / drop / vector / image now all have one).
    // The replayed copies get a VARYING event-time gap behind their
    // originals (10·media_id seconds, ids 0,3,...,27), so horizon 150 s
    // deterministically splits them: copies of ids <= 15 pair, copies
    // of 18-27 arrive after their original expired — at EVERY sf.
    // Replay event times interleave with natural ones (a copy of id 3
    // lands at +33 s, beside natural id 33), so the pair orientation
    // is (earlier (ts, id), later) — the processor's own arrival sort —
    // and the oracle orients and gap-filters by the same synthesized
    // ts. The survives-iff-gap<=horizon equivalence needs no monotone
    // ids: for ts-sorted arrivals, an intermediate arrival that could
    // have evicted entry a before b verifies would itself witness
    // ts_b - ts_a > horizon.
    QueryDef(
      "w_phash_aged",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
          .filter($"kind" === "image")
        val nat = base
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
        val rep = base.filter($"media_id" < 30)
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
          .withColumn("media_id", $"media_id" + 1000000L)
        imageNearDupPairs(nat.unionByName(rep), maxHamming = 6,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = graft.ops.Multimodal.stubBandExprs("text", "len")
          .mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, 1000000 + doc_id AS ets,
                     text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, 1000000 + 11 * doc_id AS ets,
                     text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 0 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, ets, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c
              ON (a.ets < c.ets OR (a.ets = c.ets AND a.media_id < c.media_id))
            WHERE $ham <= 6 AND c.ets - a.ets <= 150
            ORDER BY id_a, id_b"""
      }),

    // The online audio fingerprint index under batch execution — the
    // audio twin of w_phash, sharing mm_audio_pairs' naive all-pairs
    // oracle; StreamAudioSpec asserts the multi-micro-batch streaming
    // run emits this set.
    QueryDef(
      "w_audio",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "audio" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        audioNearDupPairs(base.unionByName(replayed), maxHamming = 6)
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = graft.ops.Multimodal.audioBandExprs("text", "len")
          .mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 1 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c ON a.media_id < c.media_id
            WHERE $ham <= 6
            ORDER BY id_a, id_b"""
      }),

    // The AGED online audio index — w_phash_aged's scheme on the
    // energy-delta fingerprint (audio kind: doc_id % 3 = 1; copies of
    // ids 1,4,...,13 are within the 150 s horizon, 16,...,28 are not).
    QueryDef(
      "w_audio_aged",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
          .filter($"kind" === "audio")
        val nat = base
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
        val rep = base.filter($"media_id" < 30)
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
          .withColumn("media_id", $"media_id" + 1000000L)
        audioNearDupPairs(nat.unionByName(rep), maxHamming = 6,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = graft.ops.Multimodal.audioBandExprs("text", "len")
          .mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, 1000000 + doc_id AS ets,
                     text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, 1000000 + 11 * doc_id AS ets,
                     text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 1 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, ets, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c
              ON (a.ets < c.ets OR (a.ets = c.ets AND a.media_id < c.media_id))
            WHERE $ham <= 6 AND c.ets - a.ets <= 150
            ORDER BY id_a, id_b"""
      }),

    // The online video shared-frame index under batch execution — the
    // video twin of w_phash/w_audio, completing the online family
    // across every media kind; same replayed-copies corpus and pair
    // semantics as mm_video_pairs (distinct-frame intersection counts
    // over the postings join), so the oracle re-derives that query's
    // pair set without the nh_* size columns. StreamVideoSpec asserts
    // the multi-micro-batch streaming run emits this set.
    QueryDef(
      "w_video",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "video" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        videoNearDupPairs(base.unionByName(replayed), minShared = 2)
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, text, length(text) AS len,
                       (doc_id % 30 + 1) AS nf
                FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 1
                UNION ALL
                SELECT doc_id + 1000000 AS media_id, text, length(text) AS len,
                       (doc_id % 30 + 1) AS nf
                FROM documents
                WHERE doc_id % 3 = 2 AND doc_id < 30 AND length(text) >= 1),
              f AS (
                SELECT media_id, text, len, nf, greatest(len // nf, 1) AS fl
                FROM m),
              ch AS (
                SELECT media_id, md5(sub) AS fh
                FROM (SELECT media_id, substring(text, x * fl + 1, fl) AS sub
                      FROM (SELECT *, unnest(range(0, nf, 3)) AS x FROM f))
                WHERE length(sub) > 0),
              p AS (SELECT DISTINCT media_id, fh FROM ch),
              prs AS (
                SELECT a.media_id AS id_a, b.media_id AS id_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM p a JOIN p b ON a.fh = b.fh AND a.media_id < b.media_id
                GROUP BY a.media_id, b.media_id
                HAVING count(*) >= 2)
              SELECT id_a, id_b, n_shared FROM prs
              ORDER BY id_a, id_b""")),

    // The AGED online video index — the varying-gap scheme on the
    // shared-sampled-frame verify (video kind: doc_id % 3 = 2). Unlike
    // the fingerprint kinds, a copy additionally needs >= 2 distinct
    // sampled frames to verify its original (a 1-frame video can never
    // reach minShared) — the oracle computes both the frame
    // intersection and the event-time gap exactly, so the split stays
    // deterministic without being trivially id-arithmetic.
    QueryDef(
      "w_video_aged",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
          .filter($"kind" === "video")
        val nat = base
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
        val rep = base.filter($"media_id" < 30)
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
          .withColumn("media_id", $"media_id" + 1000000L)
        videoNearDupPairs(nat.unionByName(rep), minShared = 2,
            aging = Some(Aging($"ets", 150000L)))
          .toDF().distinct()
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, 1000000 + doc_id AS ets,
                       text, length(text) AS len, (doc_id % 30 + 1) AS nf
                FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 1
                UNION ALL
                SELECT doc_id + 1000000 AS media_id, 1000000 + 11 * doc_id AS ets,
                       text, length(text) AS len, (doc_id % 30 + 1) AS nf
                FROM documents
                WHERE doc_id % 3 = 2 AND doc_id < 30 AND length(text) >= 1),
              f AS (
                SELECT media_id, ets, text, len, nf, greatest(len // nf, 1) AS fl
                FROM m),
              ch AS (
                SELECT media_id, ets, md5(sub) AS fh
                FROM (SELECT media_id, ets, substring(text, x * fl + 1, fl) AS sub
                      FROM (SELECT *, unnest(range(0, nf, 3)) AS x FROM f))
                WHERE length(sub) > 0),
              p AS (SELECT DISTINCT media_id, ets, fh FROM ch),
              prs AS (
                SELECT a.media_id AS id_a, b.media_id AS id_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM p a JOIN p b ON a.fh = b.fh
                  AND (a.ets < b.ets OR (a.ets = b.ets AND a.media_id < b.media_id))
                  AND b.ets - a.ets <= 150
                GROUP BY a.media_id, b.media_id
                HAVING count(*) >= 2)
              SELECT id_a, id_b, n_shared FROM prs
              ORDER BY id_a, id_b""")),

    // The composed ONLINE media corpus under batch execution — the
    // media twin of w_corpus and the online counterpart of
    // pipe_media: one unified kind-prefixed band state drops every
    // arrival that verifies against an earlier arrival of its kind,
    // survivors by one anti-join. The oracle reuses the shared
    // per-kind pair fragments (bandedPairDomCtes / framePairDomCtes)
    // over ALL rows of each kind — the online keep-first drop set IS
    // "later element of any verified pair", per kind, unioned.
    // StreamMediaSpec holds the multi-micro-batch run equal to the
    // batch run AND to the union of the three standalone pair
    // operators' dominated sets.
    QueryDef(
      "w_media",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
        val replayed = base.filter($"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        val corpus = base.unionByName(replayed)
        val drops = mediaDroppedByIndex(corpus).toDF().distinct()
        corpus.join(drops, Seq("media_id"), "left_anti")
          .select($"media_id", $"kind", md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some {
        import graft.ops.Multimodal.{audioBandExprs, bandedPairDomCtes, framePairDomCtes, stubBandExprs}
        val img = bandedPairDomCtes("i_",
          stubBandExprs("text", "len").mkString("[", ", ", "]"), 6)
        val aud = bandedPairDomCtes("a_",
          audioBandExprs("text", "len").mkString("[", ", ", "]"), 6)
        val vid = framePairDomCtes("v_", 2)
        s"""WITH am AS (
              SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len, (doc_id % 30 + 1) AS nf
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS media_id,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len, (doc_id % 30 + 1) AS nf
              FROM documents WHERE doc_id < 30),
            i_el AS (SELECT * FROM am WHERE kind = 'image' AND len >= 1),
            $img,
            a_el AS (SELECT * FROM am WHERE kind = 'audio' AND len >= 1),
            $aud,
            v_el AS (SELECT * FROM am WHERE kind = 'video' AND len >= 1),
            $vid,
            dom AS (
              SELECT DISTINCT id_b AS media_id FROM i_prs
              UNION SELECT id_b FROM a_prs
              UNION SELECT id_b FROM v_prs)
            SELECT media_id, kind, md5(text) AS content_md5 FROM am
            WHERE media_id NOT IN (SELECT media_id FROM dom)
            ORDER BY media_id"""
      }),

    // The AGED composed media index — w_media under the event-time
    // horizon, closing the aged family over the unified kind-prefixed
    // processor (its verify branches per kind, so the aged cycle runs
    // under all three verifies in ONE query). Same varying-gap replay
    // scheme as w_phash_aged (copy of id o lands 10·o s behind its
    // original): horizon 150 s splits the 30 copies deterministically —
    // copies of ids <= 15 verify against their original and drop,
    // copies of 16-29 outlive their original's horizon and SURVIVE,
    // per kind, at every sf. The oracle's per-kind pair fragments
    // orient and gap-filter by the same synthesized ts.
    QueryDef(
      "w_media_aged",
      (s, d) => {
        import s.implicits._
        val base = graft.ops.Multimodal.synthesize(s, d).toDF()
        val nat = base
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
        val rep = base.filter($"media_id" < 30)
          .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
          .withColumn("media_id", $"media_id" + 1000000L)
        val corpus = nat.unionByName(rep)
        val drops = mediaDroppedByIndex(corpus,
          aging = Some(Aging($"ets", 150000L))).toDF().distinct()
        corpus.join(drops, Seq("media_id"), "left_anti")
          .select($"media_id", $"kind", md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some {
        import graft.ops.Multimodal.{audioBandExprs, bandedPairDomCtes, framePairDomCtes, stubBandExprs}
        val img = bandedPairDomCtes("i_",
          stubBandExprs("text", "len").mkString("[", ", ", "]"), 6,
          agedGapSec = Some(150L))
        val aud = bandedPairDomCtes("a_",
          audioBandExprs("text", "len").mkString("[", ", ", "]"), 6,
          agedGapSec = Some(150L))
        val vid = framePairDomCtes("v_", 2, agedGapSec = Some(150L))
        s"""WITH am AS (
              SELECT doc_id AS media_id, 1000000 + doc_id AS ets,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len, (doc_id % 30 + 1) AS nf
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, 1000000 + 11 * doc_id AS ets,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len, (doc_id % 30 + 1) AS nf
              FROM documents WHERE doc_id < 30),
            i_el AS (SELECT * FROM am WHERE kind = 'image' AND len >= 1),
            $img,
            a_el AS (SELECT * FROM am WHERE kind = 'audio' AND len >= 1),
            $aud,
            v_el AS (SELECT * FROM am WHERE kind = 'video' AND len >= 1),
            $vid,
            dom AS (
              SELECT DISTINCT id_b AS media_id FROM i_prs
              UNION SELECT id_b FROM a_prs
              UNION SELECT id_b FROM v_prs)
            SELECT media_id, kind, md5(text) AS content_md5 FROM am
            WHERE media_id NOT IN (SELECT media_id FROM dom)
            ORDER BY media_id"""
      })
  )
}
