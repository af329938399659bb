package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String)

/** The online MinHash-LSH index: streaming (multi-micro-batch) emits
  * the same verified pair set as batch execution, which in turn equals
  * the batch family's minhashNearDups on the same corpus. */
class StreamNearDupSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(rows: Seq[(Long, Long, Double)]): Set[(Long, Long)] =
    rows.map(r => (r._1, r._2)).toSet

  test("jaccardSorted: two-pointer merge equals the column-form jaccard on doc gram pairs") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents").limit(50)
    val sigs = graft.ops.Dedup
      .minhashSignatures(docs, $"doc_id", $"text", 32)
      .withColumn("xs", sort_array($"xs"))
      .select($"id", $"xs")
    val pairs = sigs.as("a").crossJoin(sigs.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.xs".as("xsa"), $"b.xs".as("xsb"),
        graft.ops.Dedup.jaccard($"a.xs", $"b.xs").as("sim"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val scala2p = NearDup.jaccardSorted(
        r.getSeq[Long](0).toArray, r.getSeq[Long](1).toArray)
      assert(scala2p == r.getDouble(2), s"two-pointer != column jaccard")
    }
  }

  test("streaming near-dup pairs across 3 micro-batches == batch run == minhashNearDups") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[Doc].collect().toSeq.sortBy(_.doc_id)
    // id-ordered arrival in 3 micro-batches -> pair orientation matches batch
    val chunks = docs.grouped((docs.size + 2) / 3).toSeq
    val mem = MemoryStream[Doc]
    val q = NearDup.nearDupPairs(mem.toDF(), $"doc_id", $"text", 0.5)
      .toDF()
      .writeStream.format("memory").queryName("wnd").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wnd")
        .select($"id_a", $"id_b", $"sim").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val batched = NearDup.nearDupPairs(docs.toDF(), $"doc_id", $"text", 0.5)
        .toDF().distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val reference = graft.ops.Dedup.minhashNearDups(
          docs.toDF(), $"doc_id", $"text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(batched.nonEmpty, "corpus has no near-dup pairs at 0.5")
      assert(pairSet(streamed) == pairSet(batched))
      assert(pairSet(batched) == pairSet(reference))
      // sims agree exactly too (same sets, same arithmetic)
      assert(streamed.toSet == batched.toSet)
    } finally q.stop()
  }

  test("batch-mode heap guard: an over-cap corpus fails loudly with the actionable message, both index kinds") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    // text index: ~160k gram hashes x 16 bands at sf0.001 — any tiny
    // cap must trip at CONSTRUCTION, never an opaque mid-run OOM
    val eText = intercept[IllegalArgumentException] {
      NearDup.nearDupPairs(docs, $"doc_id", $"text", 0.5, maxIndexBytes = 1024L)
    }
    assert(eText.getMessage.contains("maxPerBand"), eText.getMessage)
    assert(eText.getMessage.contains("near-dup index"), eText.getMessage)
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val eVec = intercept[IllegalArgumentException] {
      NearDup.embedNearDupPairs(emb, $"vec_id", $"embedding", 0.4, maxIndexBytes = 1024L)
    }
    assert(eVec.getMessage.contains("embedding near-dup"), eVec.getMessage)
    // the fixture corpora sit far under the default cap — the
    // registered queries keep constructing (and the equality specs
    // above keep exercising) the guarded path unchanged
    NearDup.nearDupPairs(docs, $"doc_id", $"text", 0.5)
    NearDup.embedNearDupPairs(emb, $"vec_id", $"embedding", 0.4)
  }

  test("heap guard skips streaming inputs: the estimate is a batch aggregate, state store owns the bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Doc]
    // construction with an absurdly small cap must NOT throw on a
    // streaming frame (a batch aggregate cannot run here; bounding is
    // maxPerBand + the state store's job)
    NearDup.nearDupPairs(mem.toDF(), $"doc_id", $"text", 0.5, maxIndexBytes = 1L)
  }

  test("streaming embedding near-dup across 3 micro-batches == batch run == banded DataFrame reference") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case class Vec(vec_id: Long, embedding: Array[Float])
    val vecs = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id).toSeq
    val chunks = vecs.grouped((vecs.size + 2) / 3).toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val q = NearDup.embedNearDupPairs(
        mem.toDF().toDF("vec_id", "embedding"), $"vec_id", $"embedding", 0.4)
      .toDF()
      .writeStream.format("memory").queryName("wen").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c.map(v => (v.vec_id, v.embedding)): _*); q.processAllAvailable() }
      val streamed = spark.table("wen").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val df = vecs.map(v => (v.vec_id, v.embedding)).toDF("vec_id", "embedding")
      val batched = NearDup.embedNearDupPairs(df, $"vec_id", $"embedding", 0.4)
        .toDF().distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // independent reference: a plain DataFrame band join + cosine verify
      val prepped = df
        .select($"vec_id", graft.ops.Similarity.asDouble($"embedding").as("v"))
        .withColumn("norm", graft.ops.Similarity.l2norm($"v"))
        .filter($"norm" > 0)
      val banded = prepped.select($"vec_id",
        explode(graft.ops.Similarity.bandBucketsProbed(prepped, $"v", 8, 8)).as("bkt"))
      val reference = banded.as("a")
        .join(banded.as("b"), $"a.bkt" === $"b.bkt" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b")).distinct()
        .join(prepped.select($"vec_id".as("id_a"), $"v".as("va"), $"norm".as("na")), Seq("id_a"))
        .join(prepped.select($"vec_id".as("id_b"), $"v".as("vb"), $"norm".as("nb")), Seq("id_b"))
        .select($"id_a", $"id_b",
          (graft.ops.Similarity.dot($"va", $"vb") / ($"na" * $"nb")).as("cos"))
        .filter($"cos" >= 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batched.nonEmpty, "corpus has no embedding near-dup pairs at 0.4")
      assert(streamed == batched)
      assert(batched == reference)
    } finally q.stop()
  }

  test("online decontamination == the batch join form; stream flags == batch flags; guard trips") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    val docs = graft.model.Tables.table(spark, sf, "documents")
      .withColumn("__bucket", bucket)
    val training = docs.filter($"__bucket" >= 20).drop("__bucket")
    val benchmark = docs.filter($"__bucket" < 20).drop("__bucket")
    val idx = NearDup.buildBlocklistIndex(benchmark, $"doc_id", $"text", 0.5)
    // batch: index-probed survivors == join-based survivors, exactly
    val online = NearDup.withOnlineDecontamination(training, $"text", "__clean", idx)
      .filter($"__clean").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val joined = graft.ops.Dedup.decontaminate(training, benchmark, "doc_id", $"text", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(online == joined)
    assert(online.size < training.count(), "nothing was decontaminated — vacuous corpus")
    // streaming: the same rows through a MemoryStream get the same flags
    val batchFlags = NearDup.withOnlineDecontamination(training, $"text", "f", idx)
      .select($"doc_id", $"f").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val mem = MemoryStream[Doc]
    val q = NearDup.withOnlineDecontamination(mem.toDF(), $"text", "f", idx)
      .select($"doc_id", $"f")
      .writeStream.format("memory").queryName("wdc").outputMode("append").start()
    try {
      val rows = training.select($"doc_id", $"text").as[Doc].collect().toSeq
      rows.grouped((rows.size + 1) / 2).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamFlags = spark.table("wdc")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(streamFlags == batchFlags)
    } finally q.stop()
    // the driver-memory guard refuses a corpus-sized "blocklist"
    val e = intercept[IllegalArgumentException] {
      NearDup.buildBlocklistIndex(benchmark, $"doc_id", $"text", 0.5, maxGrams = 1L)
    }
    assert(e.getMessage.contains("blocklist too large"))
  }

  test("aging: expired entries stop pairing; stream == batch on the retained window; stale band keys removed by EventTimeTimeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // keep event times clear of epoch 0: the initial watermark is 0 and
    // the stateful operator filters rows at-or-behind it as late
    def t(sec: Long) = new java.sql.Timestamp((sec + 1000) * 1000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "pack my box with five dozen liquor jugs delivered by noon today"
    val textC = "seven wild geese crossed the frozen river before first light fell"
    // three near-dup groups far apart in event time; identical text
    // inside a group verifies at any threshold. id 7 is textA RETURNING
    // after group A's horizon: the same band keys, but entries 1-3 must
    // be evicted before it verifies. ids 8/9 are textC spaced past the
    // horizon: a pair the unaged index emits and the aged one must not.
    val rows = Seq(
      (1L, textA, t(0)), (2L, textA, t(1)), (3L, textA, t(2)),
      (4L, textB, t(100)), (5L, textB, t(101)), (6L, textB, t(102)),
      (7L, textA, t(200)),
      (8L, textC, t(300)),
      (9L, textC, t(400)))
    val df = rows.toDF("doc_id", "text", "ets")
    val horizon = NearDup.Aging($"ets", 5000L)
    val aged = NearDup.nearDupPairs(df, $"doc_id", $"text", 0.5, aging = Some(horizon))
      .toDF().distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
    assert(aged == expected, s"aged pairs $aged")
    val unaged = NearDup.nearDupPairs(df, $"doc_id", $"text", 0.5)
      .toDF().distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(unaged))
    assert(unaged.contains((1L, 7L)) && unaged.contains((8L, 9L)),
      s"unaged run should pair across windows, got $unaged")
    // streaming: one micro-batch per event-time cluster, watermarked
    def stateKeys(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val src = mem.toDF().toDF("doc_id", "text", "ets")
      .withWatermark("ets", "1 second")
    val q = NearDup.nearDupPairs(src, $"doc_id", $"text", 0.5, aging = Some(horizon))
      .toDF()
      .writeStream.format("memory").queryName("wage").outputMode("append").start()
    try {
      Seq(rows.take(3), rows.slice(3, 6), rows.slice(6, 7), rows.slice(7, 8), rows.slice(8, 9))
        .foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wage").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == aged, s"stream != batch on the retained window: $streamed")
      // by the last batch the watermark (last batch's max event time
      // minus the delay) has passed group A's re-armed horizon and
      // group B's: their band keys' state rows are REMOVED, not just
      // emptied — only textC's bands remain live, strictly fewer keys
      // than A+B held together
      val live = stateKeys(q)
      assert(live > 0, "final batch should hold textC band state")
      val bandsPerText = 16L
      assert(live <= bandsPerText,
        s"stale band keys were not removed: $live state rows live")
    } finally q.stop()
  }

  test("aging: a late-but-within-watermark arrival must not re-arm the removal clock behind the newest RETAINED entry's horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    // horizon 5 s, watermark delay 10 s. Batch 2 delivers doc 3 ALONE
    // and LATE (t=95, admitted: watermark is 93): if the re-arm clock
    // were seeded from the batch alone it would land at 95+5=100 —
    // behind retained doc 2's horizon (103+5=108) — and two dummy
    // batches later (watermark 102) the whole band state would be
    // removed while doc 2 is still live, so doc 5 (t=106, cutoff 101)
    // would silently miss its (2,5) pair
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val src = mem.toDF().toDF("doc_id", "text", "ets")
      .withWatermark("ets", "10 seconds")
    val q = NearDup.nearDupPairs(src, $"doc_id", $"text", 0.5,
        aging = Some(NearDup.Aging($"ets", 5000L)))
      .toDF()
      .writeStream.format("memory").queryName("wlate").outputMode("append").start()
    try {
      Seq(
        Seq((1L, textA, t(100)), (2L, textA, t(103))),
        Seq((3L, textA, t(95))), // late, alone
        Seq((90L, "seven wild geese crossed the frozen river at dawn", t(112))),
        Seq((91L, "pack my box with five dozen liquor jugs tonight", t(113))),
        Seq((5L, textA, t(106)))
      ).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wlate").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.contains((2L, 5L)),
        s"band state was removed while doc 2's horizon was still open: $streamed")
      assert(streamed == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 5L)),
        s"unexpected pair set $streamed")
    } finally q.stop()
  }

  test("aging: null-ts entries are exempt from eviction and still pair") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    // doc 1 carries no event time; doc 2 arrives at t=100 with a 5 s
    // horizon — its eviction cutoff (95) must not discard the null-ts
    // entry, which has no event time to age by
    val df = Seq(
      (1L, textA, null.asInstanceOf[java.sql.Timestamp]),
      (2L, textA, t(100)))
      .toDF("doc_id", "text", "ets")
    val aged = NearDup.nearDupPairs(df, $"doc_id", $"text", 0.5,
        aging = Some(NearDup.Aging($"ets", 5000L)))
      .toDF().distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aged == Set((1L, 2L)), s"null-ts entry was evicted before pairing: $aged")
  }

  test("aging applies across the online family: the composed media index ages too") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // two identical images inside one horizon, a third identical copy
    // arriving after it expired: unaged drops both copies, aged keeps
    // the late one (its predecessors are evicted before the verify)
    val content = "a perfectly memorable test pattern with plenty of pixels to hash"
    val media = Seq(
      (10L, "image", content, 1, t(0)),
      (11L, "image", content, 1, t(1)),
      (12L, "image", content, 1, t(100)))
      .toDF("media_id", "kind", "content", "n_frames", "ets")
      .withColumn("content", encode($"content", "UTF-8"))
    val agedDrops = NearDup.mediaDroppedByIndex(
        media, aging = Some(NearDup.Aging($"ets", 5000L)))
      .toDF().distinct().collect().map(_.getLong(0)).toSet
    assert(agedDrops == Set(11L), s"aged drops $agedDrops")
    val unagedDrops = NearDup.mediaDroppedByIndex(media)
      .toDF().distinct().collect().map(_.getLong(0)).toSet
    assert(unagedDrops == Set(11L, 12L), s"unaged drops $unagedDrops")
  }

  test("aging frees maxPerBand capacity: an expired entry's slot is taken by the next arrival") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    // maxPerBand = 1: unaged, doc 1 holds the only slot forever — docs
    // 2 and 3 both pair against IT and never index. Aged (5 s horizon),
    // doc 1 expires before doc 2 arrives: eviction frees the slot, doc
    // 2 indexes, and doc 3 pairs with doc 2 — the bound is on LIVE
    // entries, not on lifetime insertions.
    val df = Seq((1L, textA, t(0)), (2L, textA, t(100)), (3L, textA, t(101)))
      .toDF("doc_id", "text", "ets")
    val aged = NearDup.nearDupPairs(df, $"doc_id", $"text", 0.5,
        maxPerBand = 1, aging = Some(NearDup.Aging($"ets", 5000L)))
      .toDF().distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aged == Set((2L, 3L)), s"aged capped pairs $aged")
    val unaged = NearDup.nearDupPairs(df, $"doc_id", $"text", 0.5, maxPerBand = 1)
      .toDF().distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unaged == Set((1L, 2L), (1L, 3L)), s"unaged capped pairs $unaged")
  }

  test("maxPerBand caps state: capped run's pairs are a subset of the uncapped run") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val uncapped = NearDup.nearDupPairs(docs, $"doc_id", $"text", 0.5)
      .toDF().distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = NearDup.nearDupPairs(docs, $"doc_id", $"text", 0.5, maxPerBand = 1)
      .toDF().distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
  }
}
