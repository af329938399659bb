package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t_dsir (hashed-n-gram importance weighting) semantic pins: target-
  * typical text must outscore raw-typical text, the signed integer-bit
  * ratio must go NEGATIVE for raw-only features, selection is the
  * exact top-ceil(frac*n) by (avg bits, doc_id), and the whole
  * computation is partition-invariant (exact integer counts). */
class DsirSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("planted split: the target-vocabulary doc outscores and is selected; raw-only weight is negative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", true),
      (2L, "omega omega omega omega", false),
      (3L, "alpha alpha omega omega", false),
      (4L, "omega omega omega alpha", false)
    ).toDF("doc_id", "text", "is_tgt")
    val out = Dsir.dsirWeights(docs, $"doc_id", $"text", $"is_tgt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // doc 1 is pure target vocabulary -> highest avg, and with
    // ceil(0.25 * 4) = 1 slot it is the ONE selected document
    assert(out(1L)._2 > out(2L)._2 && out(1L)._2 > out(3L)._2 && out(1L)._2 > out(4L)._2)
    assert(out.filter(_._2._3).keySet == Set(1L))
    // a pure raw-only document's weight is negative (its features
    // have c_t = 0: the smoothed ratio is < 1, integer bits < 0)
    assert(out(2L)._1 < 0L, s"raw-only doc weight was ${out(2L)._1}")
  }

  test("real corpus: target-language docs outscore the rest on average; selection is exactly the top quarter") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dsir.dsirWeights(docs, $"doc_id", $"text", $"lang" === "en")
    val joined = out.join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
    val Array(enAvg, otherAvg) = joined
      .groupBy(($"lang" === "en").as("t")).agg(avg($"dsir_avg_bits"))
      .orderBy($"t".desc).collect().map(_.getDouble(1))
    assert(enAvg > otherAvg,
      s"target-language mean weight $enAvg not above raw $otherAvg")
    val n = out.count()
    assert(out.filter($"selected").count() == math.ceil(n * 0.25).toLong)
    // and the selected set IS the top-ceil(n/4) by (avg desc, id asc)
    val topK = out.orderBy($"dsir_avg_bits".desc, $"doc_id".asc)
      .limit(math.ceil(n * 0.25).toInt).collect().map(_.getLong(0)).toSet
    val sel = out.filter($"selected").collect().map(_.getLong(0)).toSet
    assert(sel == topK)
  }

  test("weights are partition-invariant") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.dsirWeights(d, $"doc_id", $"text", $"lang" === "en")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run(docs) == run(docs.repartition(11)))
  }
}
