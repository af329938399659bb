package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

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

  test("withRepetitionStats kept thresholds admit both classes on the real corpus") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val counts = TextAnalysis.withRepetitionStats(docs, $"text")
      .groupBy($"kept").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(1, 0L) > 0, "no document passes the repetition filter")
    assert(counts.getOrElse(0, 0L) > 0, "no document fails the repetition filter")
  }
}
