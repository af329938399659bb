package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t_select_excess (RHO-style excess-surprisal selection) semantic
  * pins: a document written in the target slice's sequences must carry
  * POSITIVE excess bits (the target model explains it better than the
  * pool model) and win selection over pool-typical text; the whole
  * computation is partition-invariant (exact integer counts). */
class ExcessSelectSpec extends AnyFunSuite with SparkSpec {

  test("planted split: target-sequence doc has the highest excess and is selected") {
    import spark.implicits._
    // targets repeat the bigram "alpha beta"; raw-only docs repeat
    // "omega gamma" — under the pool model both are probable, under
    // the target model only the alpha-beta sequences are
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta alpha beta", true),
      (3L, "omega gamma omega gamma omega gamma", false),
      (4L, "omega gamma omega gamma omega gamma", false),
      (5L, "omega gamma omega gamma omega gamma", false),
      (6L, "alpha beta alpha beta omega gamma", false),
      (7L, "omega gamma alpha beta omega gamma", false),
      (8L, "gamma omega gamma omega gamma omega", false)
    ).toDF("doc_id", "text", "is_tgt")
    val out = LmScore.excessLmSelect(docs, $"doc_id", $"text", $"is_tgt")
      .collect().map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    // ceil(0.25 * 8) = 2 slots: the two pure target-sequence docs
    assert(out(1L)._1 > out(3L)._1, s"excess: ${out(1L)._1} vs ${out(3L)._1}")
    assert(out.filter(_._2._2).keySet == Set(1L, 2L),
      s"selected = ${out.filter(_._2._2).keySet}")
    // pure raw-only sequences: the target model explains them WORSE
    // than the pool model (negative excess)
    assert(out(3L)._1 < 0.0, s"raw-only excess was ${out(3L)._1}")
  }

  test("excess weights are partition-invariant") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LmScore.excessLmSelect(docs, $"doc_id", $"text", $"lang" === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val b = LmScore.excessLmSelect(docs.repartition(13), $"doc_id", $"text",
        $"lang" === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a.nonEmpty && a == b)
  }
}
