package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite with SparkSpec {

  test("fused ShingleMinMd5 is bit-identical to the HOF pipeline, incl. non-ASCII") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"text")
      // edge shapes: empty, shorter than k, exactly k, multibyte chars
      // (slow path: char windows != byte windows), repeated windows
      .union(Seq("", "short", "exactly8", "café au lait café",
        "aaaaaaaaaaaaaaaa", "日本語のテキストです").toDF("text"))
      .withColumn("__lt", lower($"text"))
    val both = docs.select(
      graft.ops.TextAnalysis.shingleFingerprintHof($"__lt").as("hof"),
      graft.ops.TextAnalysis.shingleFingerprintOf($"__lt").as("fused")).collect()
    both.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        r.getString(0) == r.getString(1), r.toString)
    }
    // and for a couple of other shingle widths
    val w = docs.select(
      graft.ops.TextAnalysis.shingleFingerprintHof($"__lt", 3).as("hof"),
      graft.ops.TextAnalysis.shingleFingerprintOf($"__lt", 3).as("fused")).collect()
    w.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        r.getString(0) == r.getString(1), r.toString)
    }
  }

  test("fused TokenSetHits == size(filter(isin)) for every stopword list") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"text")
      .union(Seq("", "the the the", "el de la zh 的 的", "none match here").toDF("text"))
      .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
    graft.ops.TextAnalysis.stopwords.foreach { case (lang, words) =>
      val both = docs.select(
        graft.ops.TextAnalysis.stopwordHitsHof($"__toks", words).as("hof"),
        graft.ops.TextAnalysis.stopwordHits($"__toks", words).as("fused")).collect()
      both.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$lang: $r"))
    }
  }
}
