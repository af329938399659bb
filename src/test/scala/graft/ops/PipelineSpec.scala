package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val out = Pipeline.pipeCorpus(spark, sf).collect()

  test("every stage of the composition does real work on the corpus") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    val nTraining = docs.withColumn("b", bucket).filter($"b" >= 20).count()
    val nBench = docs.withColumn("b", bucket).filter($"b" < 20).count()
    assert(nBench > 0 && nTraining > 0)
    // gates dropped some docs, dedup+decon dropped more, result nonempty
    assert(out.length > 0)
    assert(out.length < nTraining, "the quality/repetition gates must filter")
  }

  test("packing invariants: offsets are the exact prefix sum in doc order, shards respect the budget") {
    val rows = out.sortBy(_.getAs[Long]("doc_id"))
    var acc = 0L
    for (r <- rows) {
      assert(r.getAs[Long]("token_offset") == acc,
        s"offset mismatch at doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("shard") == acc / 5000L)
      acc += r.getAs[Long]("n_bpe_tokens")
    }
  }

  test("chunk counts match the window arithmetic; BPE fertility > 1") {
    for (r <- out) {
      val n = r.getAs[Long]("n_bpe_tokens")
      val expect = math.max(n - 1, 0L) / 48L + 1L
      assert(r.getAs[Long]("n_chunks") == expect)
      // the budget stages tokenize the EXCISED text, so fertility is
      // relative to the surviving word count
      assert(n >= r.getAs[Long]("n_ws_tokens") - r.getAs[Long]("n_excised"),
        "subword count must be >= surviving word count")
    }
  }

  test("LM gate and span excision are live stages: gate bounds every survivor, excision wiring removes spans on the raw corpus") {
    assert(out.forall(_.getAs[Double]("avg_bits") <= graft.streaming.StreamCorpus.LmGate))
    assert(out.map(_.getAs[Double]("avg_bits")).distinct.length > 1,
      "the LM score must be a real per-document signal, not a constant")
    for (r <- out) {
      val ex = r.getAs[Long]("n_excised")
      assert(ex >= 0L && ex <= r.getAs[Long]("n_ws_tokens"))
    }
    // On this fixture the composed pipeline excises nothing: every
    // duplicated >= 8-token span lives in a document the repetition
    // gate or the minhash dedup already dropped — which is itself the
    // expected interplay (RefinedWeb orders doc-level dedup before
    // exact-substring for this reason). Prove the stage's WIRING on
    // the raw corpus, where spans exist (dd_apply_spans: 24 docs):
    import spark.implicits._
    val raw = graft.model.Tables.table(spark, sf, "documents")
    val exc = Dedup.withSpanExcision(raw, $"doc_id", $"text", tag = "spec_spans")
    assert(exc.filter($"n_excised" > 0L).count() > 0L,
      "span excision must remove spans on the raw corpus")
  }

  test("mixture flag: membership is the portable-hash rule against the per-lang survivor count") {
    val byLang = out.groupBy(_.getAs[String]("lang"))
    for ((lang, rows) <- byLang) {
      val nLang = rows.head.getAs[Long]("n_lang")
      assert(nLang == rows.length.toLong, s"n_lang must count survivors of $lang")
      val thr = math.floor(math.min(1.0, 8.0 / math.sqrt(nLang.toDouble)) * 1e6).toLong
      for (r <- rows) {
        val h = graft.functions.PortableHash
          .md5Hash60Jvm(r.getAs[Long]("doc_id").toString) % 1000000L
        assert(r.getAs[Int]("mix_kept") == (if (h < thr) 1 else 0))
      }
    }
  }

  test("quality floor holds on every surviving row") {
    assert(out.forall(_.getAs[Double]("quality") >= 0.6))
    assert(out.forall(_.getAs[Long]("n_ws_tokens") >= 30L))
  }

  test("pipe_curate: stage invariants — selection median, one keeper per cluster, sample bound, exact segment tiling") {
    import spark.implicits._
    val rows = Pipeline.pipeCurate(spark, sf).collect()
    assert(rows.nonEmpty, "curation pipeline emitted nothing at smoke scale")
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val n = docs.count()

    // stage 1: every surviving doc's quality is in the corpus top half
    // — at least as high as the worst selected score (the frozen
    // threshold w_select_quality freezes)
    val q = docs.withColumn("__toks", TextAnalysis.tokens($"text"))
      .select(TextAnalysis.qualityScoreOf($"text", $"__toks").as("q"))
      .collect().map(_.getDouble(0)).sorted(Ordering[Double].reverse)
    val thr = q((math.ceil(n * 0.5) - 1).toInt)
    assert(rows.forall(_.getAs[Double]("quality") >= thr),
      "a surviving doc is below the corpus-relative selection threshold")

    // stage 2: one doc per cluster (the keep-best policy collapsed
    // every near-dup cluster to one survivor)
    val perCluster = rows.map(r =>
      r.getAs[Long]("cluster") -> r.getAs[Long]("doc_id")).distinct
    assert(perCluster.map(_._1).distinct.length == perCluster.length,
      "a cluster kept more than one survivor")

    // stage 3: the systematic sample emits at most m = 100 documents
    val sampledDocs = rows.map(_.getAs[Long]("doc_id")).distinct
    assert(sampledDocs.length <= 100, s"${sampledDocs.length} docs > m")

    // stage 4: batches respect the batch size within each (band, batch)
    rows.groupBy(r => (r.getAs[Long]("len_band"), r.getAs[Long]("batch")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long]("doc_id")).distinct.length <= 32) }

    // stage 5: segments tile each document's token interval exactly —
    // per-doc tok_len sums to n_tokens, segments are contiguous, and
    // every non-terminal shard boundary is honored exactly
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("shard"))
      val nt = sorted.head.getAs[Long]("n_tokens")
      assert(sorted.map(_.getAs[Long]("tok_len")).sum == nt,
        s"doc $id: segment lengths don't sum to n_tokens")
      assert(sorted.head.getAs[Long]("tok_start") == 0L,
        s"doc $id: first segment doesn't start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("tok_start") + a.getAs[Long]("tok_len") ==
            b.getAs[Long]("tok_start"), s"doc $id: segment gap")
          assert(b.getAs[Long]("shard") == a.getAs[Long]("shard") + 1,
            s"doc $id: non-contiguous shards")
        case _ => ()
      }
    }
    // global tiling: total segment tokens == total sampled tokens, and
    // every shard except the last holds EXACTLY the 2000-token budget
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
      .map { case (s0, rs) => s0 -> rs.map(_.getAs[Long]("tok_len")).sum }
    val lastShard = byShard.keys.max
    byShard.filter(_._1 != lastShard).foreach { case (s0, tot) =>
      assert(tot == 2000L, s"shard $s0 holds $tot tokens != budget") }
  }
}
