package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite with SparkSpec {

  /** Independent reference: expanded (non-rolling) window polynomial in
    * BigInt — no 64-bit wrap tricks, no slide recurrence — then the
    * affine scramble as a true mod-2^61. Mirrors what the DuckDB oracle
    * computes, term by term. */
  private def referenceFp(s: String, k: Int): Option[Long] = {
    val cps = s.codePoints.toArray
    if (cps.length < k) return None
    val pows = ShingleMinRoll.powers(k).map(BigInt(_))
    val mod = BigInt(1) << 61
    val hashes = (0 to cps.length - k).map { i =>
      val v = (0 until k).map(j => BigInt(cps(i + j)) * pows(j)).sum
      ((BigInt(ShingleMinRoll.MixA) * v + BigInt(ShingleMinRoll.MixC)) mod mod).toLong
    }
    Some(hashes.min)
  }

  test("fused ShingleMinRoll matches the BigInt window-polynomial reference, incl. non-ASCII") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"text")
      // edge shapes: empty, shorter than k, exactly k, multibyte chars
      // (slow path: char windows != byte windows), repeated windows
      .union(Seq("", "short", "exactly8", "café au lait café",
        "aaaaaaaaaaaaaaaa", "日本語のテキストです").toDF("text"))
      .withColumn("__lt", lower($"text"))
    for (k <- Seq(8, 3)) {
      val rows = docs.select($"__lt",
        graft.ops.TextAnalysis.shingleFingerprintOf($"__lt", k).as("fused")).collect()
      rows.foreach { r =>
        val expected = referenceFp(r.getString(0), k)
        val actual = if (r.isNullAt(1)) None else Some(r.getLong(1))
        assert(actual == expected, s"k=$k text=${r.getString(0).take(40)}")
      }
    }
  }

  test("ShingleMinRoll handles supplementary code points as single characters") {
    import spark.implicits._
    // U+1F600 is one code point (one DuckDB character) but two UTF-16
    // chars — the codePoints walk must not split it
    val s = "a😀b😀c😀d😀e"
    val r = Seq(s).toDF("t")
      .select(graft.ops.TextAnalysis.shingleFingerprintOf($"t", 3).as("fp")).head()
    assert(referenceFp(s, 3).contains(r.getLong(0)))
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
