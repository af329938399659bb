package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in ONE compiled
  * pass — the fused form of the engine's canonical shingle pipeline
  *
  *   array_distinct(transform(sequence(...), i =>
  *     concat_ws(" ", slice(filter(split(lower(text), "\\s+"), ...)))))
  *
  * whose four nested higher-order functions are all CodegenFallback:
  * the interpreted tree was the single largest shared cost of the
  * dedup family (tokenize+shingle ran >1s per query at sf0.1 before
  * any pairing work started). Semantics are identical by construction
  * and asserted in DedupSpec:
  *
  *  - lowercase via UTF8String.toLowerCase — the exact primitive
  *    behind Spark's `lower` (locale-independent), not
  *    String.toLowerCase;
  *  - tokens = regex \s+ split with empty strings dropped (Spark's
  *    `split` + `filter(_ != "")`);
  *  - shingles = n consecutive tokens joined by " ", first-occurrence
  *    order, distinct (array_distinct keeps first occurrences);
  *  - fewer than n tokens -> empty array (the `when(size >= n)` arm).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordShingles requires string, got ${t.sql}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val toks0 = ws.split(text.toLowerCase.toString, -1)
    // regex split emits "" for leading separators; the pipeline's
    // filter(t => t != "") drops them anywhere
    var m = 0
    var k = 0
    while (k < toks0.length) { if (toks0(k).nonEmpty) m += 1; k += 1 }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](m)
    m = 0; k = 0
    while (k < toks0.length) {
      if (toks0(k).nonEmpty) { toks(m) = toks0(k); m += 1 }
      k += 1
    }
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Lowercased whitespace tokens (multiplicity and order preserved) in
  * one compiled pass — the fused form of
  * `filter(split(lower(text), "\\s+"), t => t != "")`, whose filter
  * HOF is CodegenFallback. Same primitives as [[WordShingles]]
  * (UTF8String.toLowerCase, regex \s+ split, empties dropped), so
  * token streams are bit-identical to the HOF pipeline
  * (DedupSpec asserts it). */
case class WordTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordTokens requires string, got ${t.sql}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val toks0 = ws.split(text.toLowerCase.toString, -1)
    var m = 0
    var k = 0
    while (k < toks0.length) { if (toks0(k).nonEmpty) m += 1; k += 1 }
    val out = new Array[Any](m)
    m = 0; k = 0
    while (k < toks0.length) {
      if (toks0(k).nonEmpty) { out(m) = UTF8String.fromString(toks0(k)); m += 1 }
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenizer", this, classOf[WordTokens].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** Distinct lowercased tokens with their multiplicities —
  * array<struct<tok, cnt>> in first-occurrence order — in one compiled
  * pass. Same token stream as [[WordTokens]] (UTF8String.toLowerCase,
  * regex \s+ split, empties dropped), collapsed to (token, count)
  * entries so downstream per-token work (hashing a token for a
  * weighted vote) runs once per DISTINCT token in the doc instead of
  * once per occurrence — natural text repeats tokens 5-10x, and the
  * collapse happens inside the row, before any explode/shuffle.
  * Zero tokens -> empty array (explodes to no rows). */
case class WordTokenCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordTokenCounts requires string, got ${t.sql}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val toks0 = ws.split(text.toLowerCase.toString, -1)
    val counts = new java.util.LinkedHashMap[String, Integer](toks0.length * 2)
    var k = 0
    while (k < toks0.length) {
      if (toks0(k).nonEmpty)
        counts.merge(toks0(k), Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      k += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("counter", this, classOf[WordTokenCounts].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordTokenCounts =
    copy(child = newChild)
}

object TextShingles {
  /** Fused distinct word n-gram shingles (see [[WordShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Fused lowercase whitespace tokenizer (see [[WordTokens]]). */
  def wordTokens(text: Column): Column =
    ColumnBridge.column(WordTokens(ColumnBridge.expression(text)))

  /** Fused distinct (token, count) entries (see [[WordTokenCounts]]). */
  def wordTokenCounts(text: Column): Column =
    ColumnBridge.column(WordTokenCounts(ColumnBridge.expression(text)))
}
