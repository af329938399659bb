package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  test("chunkWindows: full token coverage, overlap, tail chunk, empty-doc edge") {
    import spark.implicits._
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens, width 4 stride 3 -> starts 0,3,6
      (2L, "a b"),                  // shorter than width -> one short chunk
      (3L, "")                      // empty -> one empty chunk, not dropped
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkWindows(df, $"doc_id", $"text", width = 4, stride = 3)
      .orderBy($"doc_id", $"chunk_idx").collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 1L))) // (start, len): tail chunk short
    // every token index is covered by at least one chunk
    val covered = d1.flatMap(r => r.getLong(3) until (r.getLong(3) + r.getLong(4))).toSet
    assert(covered == (0L until 7L).toSet)
    // chunk content md5 is the md5 of the rejoined slice
    val firstMd5 = d1.head.getString(5)
    assert(firstMd5 == java.security.MessageDigest.getInstance("MD5")
      .digest("t0 t1 t2 t3".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    assert(rows.filter(_.getLong(0) == 2L).map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 2L)))
    assert(rows.filter(_.getLong(0) == 3L).map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L)))
  }

  test("packShardsShuffled: exact permutation prefix sum, shift-invariant, actually shuffled") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    def run(d: org.apache.spark.sql.DataFrame, shift: Int) =
      TextAnalysis.packShardsShuffled(d, $"doc_id", $"text",
          budget = 5000L, bucketShift = shift)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run(docs, 50)
    // offsets are the prefix sums of SOME permutation: sorted by
    // offset, each doc starts exactly where the previous ended
    val byOff = rows.sortBy(_._3)
    assert(byOff.head._3 == 0L)
    byOff.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 + a._2 == b._3, s"gap between ${a._1} and ${b._1}") }
    // the permutation is the portable-hash order, NOT the id order
    val idOrderOffsets = rows.scanLeft(0L)(_ + _._2).init
    assert(rows.map(_._3).toSeq != idOrderOffsets.toSeq)
    def h60(id: Long) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(byOff.map(_._1).toSeq == rows.map(_._1).sortBy(id => (h60(id), id)).toSeq)
    // the bucketed decomposition is exact: any shift gives the same offsets
    assert(run(docs, 45).toSeq == rows.toSeq)
    assert(run(docs, 55).toSeq == rows.toSeq)
    // and partitioning-invariant
    assert(run(docs.repartition(13), 50).toSeq == rows.toSeq)
  }

  test("mixtureSample: dominant group flattened harder, membership partition-invariant") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val got = TextAnalysis.mixtureSample(docs, $"doc_id", $"lang", k = 3.0)
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // tau = 1/2: applied rate is monotonically DECREASING in group size
    val bySize = got.sortBy(_._2)
    assert(bySize.zip(bySize.tail).forall { case (a, b) => a._3 >= b._3 })
    // rate formula holds exactly: min(1, 3/sqrt(n))
    got.foreach { case (_, n, p, _) =>
      assert(p == math.min(1.0, 3.0 / math.sqrt(n.toDouble))) }
    // membership is hash-derived -> identical on any partitioning
    val repartitioned = TextAnalysis.mixtureSample(
        docs.repartition(13), $"doc_id", $"lang", k = 3.0)
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == repartitioned.toSeq)
  }

  test("withRepetitionStats: hand-computed duplicate n-gram fractions, short-text edges") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b"),     // n=3 d1=2 -> 1/3; bigrams {a a, a b} -> 0; trigram 1 distinct -> 0
      (2L, "a a a a"),   // n=4 d1=1 -> 3/4; bigrams 3, distinct {a a} -> 2/3; trigrams 2, distinct 1 -> 1/2
      (3L, "x"),         // single token: no bigrams/trigrams -> ratios 0
      (4L, ""),          // zero tokens -> all 0
      (5L, "p q r s")    // all distinct -> all 0, kept
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.withRepetitionStats(df, $"text")
      .select($"doc_id", $"n_tokens", $"dup_token_ratio",
        $"dup_bigram_ratio", $"dup_trigram_ratio", $"kept")
      .orderBy($"doc_id").collect()
    def r(i: Int) = (rows(i).getLong(1), rows(i).getDouble(2),
      rows(i).getDouble(3), rows(i).getDouble(4), rows(i).getInt(5))
    assert(r(0) == ((3L, 1.0 / 3, 0.0, 0.0, 1)))
    assert(r(1) == ((4L, 0.75, 2.0 / 3, 0.5, 0)))
    assert(r(2) == ((1L, 0.0, 0.0, 0.0, 1)))
    assert(r(3) == ((0L, 0.0, 0.0, 0.0, 1)))
    assert(r(4) == ((4L, 0.0, 0.0, 0.0, 1)))
  }

  test("bm25Scores: hand-computed tiny corpus, zero-hit docs score 0, partition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark query spark window"),
      (2L, "alpha beta gamma"),
      (3L, "query merge vector spark window")
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25Scores(d, $"doc_id", $"text", TextAnalysis.bm25Terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val rows = run(df)
    val byId = rows.map(t => t._1 -> t).toMap
    assert(byId(2L)._3 == 0 && byId(2L)._4 == 0.0, "no query term -> n_hit 0, score 0")
    assert(byId(1L)._3 == 3 && byId(3L)._3 == 5)
    // doc 1 expected score, same double arithmetic as the operator:
    // terms spark(tf 2, df 2), query(1, 2), vector(0, 1), merge(0, 1),
    // window(1, 2); N = 3, sl = 12, dl = 4.
    val n = 3.0; val avgdl = 12.0 / n
    def term(tf: Double, df: Double, dl: Double) =
      ((n - df + 0.5) / (df + 0.5)) *
        (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    val exp1 = term(2, 2, 4) + term(1, 2, 4) + term(0, 1, 4) + term(0, 1, 4) + term(1, 2, 4)
    assert(byId(1L)._4 == exp1, s"got ${byId(1L)._4}, want $exp1")
    assert(run(df.repartition(7)) == rows, "scores must not depend on partitioning")
  }

  test("withRepetitionStats kept thresholds admit both classes on the real corpus") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val counts = TextAnalysis.withRepetitionStats(docs, $"text")
      .groupBy($"kept").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(1, 0L) > 0, "no document passes the repetition filter")
    assert(counts.getOrElse(0, 0L) > 0, "no document fails the repetition filter")
  }

  test("t_mix_rebalance: exact integer rates, min source keeps everything, over-represented sources downsample") {
    val out = graft.SparkEntry.queries("t_mix_rebalance")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 1)
    // (source, n_total, tokens_total, rate_ppm, n_kept, tokens_kept)
    val mts = out.map(_.getLong(2)).min
    out.foreach { r =>
      val (ts, rate) = (r.getLong(2), r.getLong(3))
      assert(rate == mts * 1000000L / ts,
        s"${r.getString(0)}: rate $rate != exact ${mts * 1000000L / ts}")
      assert(r.getLong(4) <= r.getLong(1) && r.getLong(5) <= ts)
    }
    // the smallest source is never downsampled
    val minRow = out.find(_.getLong(2) == mts).get
    assert(minRow.getLong(3) == 1000000L)
    assert(minRow.getLong(4) == minRow.getLong(1),
      s"min source dropped docs: ${minRow.getLong(4)} of ${minRow.getLong(1)}")
    // and at least one over-represented source actually dropped docs
    assert(out.exists(r => r.getLong(4) < r.getLong(1)))
  }
}
