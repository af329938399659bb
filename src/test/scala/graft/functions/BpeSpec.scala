package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkSpec {

  /** Independent fold formulation of one merge round — the shape the
    * DuckDB oracle's list_reduce CTEs run. Equivalence with the
    * implementation's left-to-right scan is the load-bearing claim
    * behind the cross-engine hash-compare. */
  private def foldMerge(seq: List[String], a: String, b: String): List[String] =
    seq.foldLeft(List.empty[String]) { (acc, e) =>
      if (acc.nonEmpty && acc.last == a && e == b) acc.init :+ (a + b)
      else acc :+ e
    }

  private def foldWord(word: String): List[String] =
    Bpe.merges.foldLeft(Bpe.Boundary +: word.toList.map(_.toString)) {
      case (seq, (a, b)) => foldMerge(seq, a, b)
    }

  test("merges fixture loads: 768 ordered pairs (64 organic + 704 hex-extension), no empties") {
    assert(Bpe.merges.length == 768)
    assert(Bpe.merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
    // first merge as trained (most frequent pair of the seed corpus)
    assert(Bpe.merges.head == (("▁", "s")))
    // the organic prefix is intact: merge 65+ is the hex extension,
    // whose produced symbols are boundary-or-hex only
    val hexish = ("▁" + "0123456789abcdef").toSet
    assert(Bpe.merges.drop(64).forall { case (a, b) =>
      (a + b).forall(hexish.contains) })
  }

  test("golden words: learned vocabulary tokenizes to single symbols") {
    for (w <- Seq("scan", "column", "window", "order", "join", "merge",
        "group", "query", "value", "line", "key", "part", "sort"))
      assert(Bpe.tokenizeWord(w).toSeq == Seq("▁" + w), s"word $w")
    // unseen word falls back to learned subwords + chars
    assert(Bpe.tokenizeWord("scanner").toSeq == Seq("▁scan", "n", "er"))
  }

  test("scan == fold on every distinct corpus word (oracle equivalence)") {
    val words = graft.model.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.length > 20) // the synthetic corpus draws from a ~30-word vocabulary
    for (w <- words)
      assert(Bpe.tokenizeWordUncached(w).toSeq == foldWord(w), s"word $w")
  }

  test("tokens concatenate losslessly back to the boundary-marked word") {
    for (w <- Seq("scan", "scanner", "qqq", "a", "antidisestablishment"))
      assert(Bpe.tokenizeWord(w).mkString == "▁" + w)
  }

  test("memoized path == uncached path") {
    for (w <- Seq("scan", "scanner", "window", "zzz"))
      assert(Bpe.tokenizeWord(w).toSeq == Bpe.tokenizeWordUncached(w).toSeq)
  }

  test("normalization: lowercase, reserved glyphs stripped, whitespace split") {
    import scala.jdk.CollectionConverters._
    // tokenizeText expects pre-lowercased input (the expression
    // lowercases via UTF8String.toLowerCase first)
    assert(Bpe.tokenizeText("scan  scan").asScala.toSeq ==
      Seq("▁scan", "▁scan"))
    assert(Bpe.tokenizeText("sc␟an ▁scan").asScala.toSeq ==
      Seq("▁scan", "▁scan"))
    assert(Bpe.tokenizeText("  \n\t ").asScala.isEmpty)
    assert(Bpe.tokenizeText("").asScala.isEmpty)
  }

  test("expression: codegen path matches direct tokenization; null passes through") {
    import spark.implicits._
    val df = Seq((1L, "Scan the COLUMN"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select($"id", Bpe.bpeTokens($"text").as("toks"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[String](1) ==
      Seq("▁scan", "▁t", "h", "e", "▁column"))
    assert(got(1).getSeq[String](1).isEmpty)
    assert(got(2).isNullAt(1))
  }

  test("fertility: corpus tokenizes to more subwords than words, bounded") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(
        sum(size(graft.ops.TextAnalysis.tokens($"text"))).as("w"),
        sum(size(Bpe.bpeTokens($"text"))).as("b"))
      .collect()(0)
    val (w, b) = (r.getLong(0), r.getLong(1))
    assert(b > w, "subword count must exceed word count")
    assert(b < w * 6, "64 merges over a-z should stay well under chars+1 per word")
  }
}
