package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite with SparkSpec {

  test("lmScore: hand-computed bits on a tiny corpus") {
    import spark.implicits._
    // uni: a:3 b:2 c:1, V=3; bigrams: (a,b):2 (b,a):1 (a,c):1
    // d1 (a b a b): (a,b) n=3 d=6 k=1; (b,a) n=2 d=5 k=1; (a,b) k=1
    // d2 (a c):     (a,c) n=2 d=6 k=1
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LmScore.lmScore(df, $"doc_id", $"text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 3L, 1.0), (2L, 1L, 1L, 1.0)))
  }

  test("lmScore: repeated common text scores fewer bits/token than rare text") {
    import spark.implicits._
    val common = (1 to 30).map(i => (i.toLong, "the cat sat on the mat"))
    // all-distinct vocabulary: every bigram count 1, every unigram count 1
    val rare = (31 to 35).map(i =>
      (i.toLong, (0 until 6).map(j => s"rare${i}_$j").mkString(" ")))
    val df = (common ++ rare).toDF("doc_id", "text")
    val avg = LmScore.lmScore(df, $"doc_id", $"text")
      .select($"doc_id", $"avg_bits").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val commonAvg = common.map(c => avg(c._1)).max
    val rareAvg = rare.map(c => avg(c._1)).min
    assert(commonAvg < rareAvg,
      s"common=$commonAvg should score below rare=$rareAvg")
  }

  test("lmScore: sub-bigram documents drop out; result partition-invariant") {
    import spark.implicits._
    val df = Seq((1L, "x y z"), (2L, "solo"), (3L, ""), (4L, "x y")).toDF("doc_id", "text")
    val ids = LmScore.lmScore(df, $"doc_id", $"text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L))

    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val a = LmScore.lmScore(docs, $"doc_id", $"text")
      .orderBy($"doc_id").collect().toSeq
    val b = LmScore.lmScore(docs.repartition(13), $"doc_id", $"text")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    // integer-bit invariants on the real corpus: nonnegative, consistent avg
    a.foreach { r =>
      assert(r.getLong(2) >= 0L)
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
  }
}
