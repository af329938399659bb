package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE) tokenization against a committed merges table —
  * classic Sennrich et al. 2016 byte-pair encoding (public:
  * arXiv 1508.07909), applied exactly as trained:
  *
  *  - normalization: lowercase (UTF8String.toLowerCase, the primitive
  *    behind Spark's `lower`), the two reserved glyphs `␟` and `▁`
  *    stripped, words = regex `\s+` split with empties dropped — the
  *    same stream [[WordTokens]] produces, minus the reserved chars;
  *  - each word starts as the symbol sequence `▁, c1, c2, …` (code
  *    points, SentencePiece-style word-boundary marker);
  *  - the merges are applied IN TRAINING ORDER; each merge rewrites
  *    all occurrences of its pair in one left-to-right scan (a later
  *    occurrence never consumes a symbol an earlier rewrite produced).
  *    Order matters: a rank-priority scheduler would re-visit an
  *    earlier pair whose right side is created by a later merge, so
  *    the application loop is deliberately sequential, matching the
  *    trainer (`tools/train_bpe.py`) and the DuckDB oracle
  *    (chained `list_reduce` CTEs, one per merge) symbol-for-symbol.
  *    BpeSpec asserts scan == the independent fold formulation.
  *
  * The merges fixture lives on the classpath
  * (`graft/bpe_merges.txt`, one `left<TAB>right` per line, training
  * order), so executors load it locally — nothing is shipped per-task
  * and the expression tree stays constant-size.
  *
  * Scale shape: per-row compute, no shuffle, rides whole-stage
  * codegen like the other fused text expressions. Word→tokens results
  * are memoized per thread (Zipfian corpora re-tokenize the same
  * words constantly; the LRU bounds memory at ~64k words/thread), so
  * the 64-merge scan runs roughly once per DISTINCT word per task,
  * not once per occurrence.
  */
object Bpe {
  val Boundary = "▁"
  private val Stripped = "␟"

  /** Merges in training (= application) order, from the committed
    * classpath fixture. */
  lazy val merges: Array[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing classpath resource graft/bpe_merges.txt")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { l =>
          val t = l.indexOf('\t')
          require(t > 0, s"malformed merge line: $l")
          (l.substring(0, t), l.substring(t + 1))
        }
        .toArray
    } finally in.close()
  }

  /** One word → its BPE symbol sequence (uncached). */
  private[graft] def tokenizeWordUncached(word: String): Array[String] = {
    // initial symbols: boundary marker + code points
    var n = 1 + word.codePointCount(0, word.length)
    var seq = new Array[String](n)
    seq(0) = Boundary
    var i = 0
    var k = 1
    while (i < word.length) {
      val cp = word.codePointAt(i)
      seq(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    val ms = merges
    var m = 0
    while (m < ms.length) {
      val a = ms(m)._1
      val b = ms(m)._2
      // one left-to-right scan replacing every (a, b) occurrence
      var r = 0 // read
      var w = 0 // write
      while (r < n) {
        if (r < n - 1 && seq(r) == a && seq(r + 1) == b) {
          seq(w) = a + b
          r += 2
        } else {
          seq(w) = seq(r)
          r += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    java.util.Arrays.copyOf(seq, n)
  }

  private val cache =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
      override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
        new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean =
            size() > (1 << 16)
        }
    }

  /** One word → its BPE symbol sequence (per-thread LRU memoized). */
  def tokenizeWord(word: String): Array[String] = {
    val c = cache.get()
    val hit = c.get(word)
    if (hit != null) hit
    else {
      val v = tokenizeWordUncached(word)
      c.put(word, v)
      v
    }
  }

  // Same whitespace definition as WordTokens / the DuckDB oracle's
  // split(text, '\s+'): java.util.regex \s is exactly [ \t\n\x0B\f\r],
  // whereas Character.isWhitespace also matches U+001C-001F and most
  // Unicode spaces — the word streams must agree character-for-character.
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Whole text → flat BPE token stream (normalization as trained). */
  def tokenizeText(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](text.length / 2 + 1)
    val norm = text.replace(Stripped, "").replace(Boundary, "")
    val words = ws.split(norm, -1)
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val toks = tokenizeWord(words(w))
        var t = 0
        while (t < toks.length) { out.add(toks(t)); t += 1 }
      }
      w += 1
    }
    out
  }

  def bpeTokens(text: Column): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text)))
}

/** Fused `text → array<string>` BPE tokenizer expression (see [[Bpe]]
  * for semantics). Same codegen shape as [[WordTokens]]: a single
  * compiled call into the tokenizer, no interpreted HOF tree. */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpeTokens requires string, got ${t.sql}")
  }

  def compute(text: UTF8String): ArrayData = {
    val toks = Bpe.tokenizeText(text.toLowerCase.toString)
    val out = new Array[Any](toks.size())
    var i = 0
    while (i < out.length) { out(i) = UTF8String.fromString(toks.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpe", this, classOf[BpeTokens].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
