package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

/** Distinct HASHES of the distinct word n-gram shingles of a text
  * column, in one compiled pass — the in-row form of
  *
  *   groupBy(doc).agg(collect_set(hash(explode(wordShingles(text)))))
  *
  * which shuffled every posting into an ObjectHashAggregate and
  * re-exploded the set, purely to dedupe by hash value. Shingle
  * construction is [[WordShingles]]'s exactly (same tokenizer, same
  * first-occurrence distinct), and the hash dedupe happens in a local
  * set before any exchange — identical hash SETS by construction
  * (if two distinct shingles collide, both forms keep the value once),
  * asserted in DedupSpec for both kinds.
  *
  * hashKind selects the engine's two gram-identity families:
  *  - "uh30": PortableHash.uhBase — long of the first 15 hex chars of
  *    md5, mod 2^30 (the oracle-replayable family);
  *  - "xx64": Spark's xxhash64 with its default seed 42.
  */
case class HashedWordShingles(child: Expression, n: Int, hashKind: String)
    extends UnaryExpression {
  require(hashKind == "uh30" || hashKind == "xx64", s"unknown hashKind $hashKind")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashedWordShingles requires string, got ${t.sql}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  private def hashShingle(s: String): Long =
    if (hashKind == "xx64") {
      val u = UTF8String.fromString(s)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    } else {
      // first 15 hex chars of md5 as a long (PortableHash.md5Hash60:
      // 7 full bytes then the high nibble of the 8th), mod 2^30
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xFF); i += 1 }
      v = (v << 4) | ((d(7) & 0xFF) >>> 4)
      v % PortableHash.UH_DOMAIN
    }

  def compute(text: UTF8String): ArrayData = {
    val toks0 = ws.split(text.toLowerCase.toString, -1)
    var m = 0
    var k = 0
    while (k < toks0.length) { if (toks0(k).nonEmpty) m += 1; k += 1 }
    if (m < n) return ArrayData.toArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    m = 0; k = 0
    while (k < toks0.length) {
      if (toks0(k).nonEmpty) { toks(m) = toks0(k); m += 1 }
      k += 1
    }
    // distinct shingle strings first (exactly WordShingles), THEN
    // distinct hashes — matches collect_set over hashed distinct grams
    val seen = new java.util.HashSet[String](m * 2)
    val out = new java.util.LinkedHashSet[java.lang.Long](m * 2)
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
      val s = sb.toString
      if (seen.add(s)) out.add(hashShingle(s))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    ArrayData.toArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedShingler", this, classOf[HashedWordShingles].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
    copy(child = newChild)
}

/** POSITIONAL 60-bit gram hashes of a text column in one compiled
  * pass: element i (0-based) is `PortableHash.md5Hash60` of the
  * space-joined n-gram starting at token i — NOT distinct, one entry
  * per start position, `max(m - n + 1, 0)` entries for m tokens.
  *
  * Why it exists: the positional stage of the duplicated-span
  * operator (dd_dup_spans) needs (position, gram hash) rows. The
  * declarative form explodes start positions while CARRYING the full
  * token array through the generator so each output row can re-slice
  * it — the per-row bytes are amplified by the position count, which
  * at corpus scale turns a narrow fan-out into an array-copy storm
  * (t_chunk tolerates this because chunks are ~n/stride per doc;
  * grams are ~n per doc). This expression emits the 8-byte hashes
  * directly, so the explode fans out longs and the token array never
  * leaves the row it was parsed in.
  *
  * Tokenization and hashing are bit-identical to the pipeline it
  * replaces ([[WordTokens]] semantics + md5Hash60 of the same joined
  * string — DedupSpec asserts parity against the slice/array_join/
  * conv(md5) column form on the real corpus). Null text -> null. */
case class PositionalGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"positionalGramHashes requires string, got ${t.sql}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val toks0 = ws.split(text.toLowerCase.toString, -1)
    var m = 0
    var k = 0
    while (k < toks0.length) { if (toks0(k).nonEmpty) m += 1; k += 1 }
    if (m < n) return ArrayData.toArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    m = 0; k = 0
    while (k < toks0.length) {
      if (toks0(k).nonEmpty) { toks(m) = toks0(k); m += 1 }
      k += 1
    }
    val out = new Array[Long](m - n + 1)
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
      out(i) = PortableHash.md5Hash60Jvm(sb.toString)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("posGramHasher", this, classOf[PositionalGramHashes].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
    copy(child = newChild)
}

/** Occurrence count of array elements belonging to a constant word
  * set, in one compiled pass — the fused form of
  * `size(filter(toks, t => t.isin(words)))`, whose filter HOF is
  * CodegenFallback and ran interpreted once per (row, language) in
  * the stopword/lang-id queries. Identical counting: string equality
  * on UTF8String (what isin compares), null elements skipped (a null
  * fails the isin predicate and is dropped by filter). */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokenSetHits requires array<string>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hits", this, classOf[TokenSetHits].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

/** Intersection size of two SORTED bigint arrays in one linear merge —
  * the verify kernel for pair-bound set-similarity checks. Equivalent
  * to `size(array_intersect(a, b))` on duplicate-free inputs (spec
  * asserts it), but a codegen'd two-pointer walk over primitive longs
  * instead of an interpreted per-row hash-set build. Inputs must be
  * ascending (sort_array) and distinct (HashedWordShingles emits
  * distinct grams); duplicates would count min-multiplicity, which for
  * distinct inputs is the same set semantics. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sortedLongIntersectCount requires two array<bigint>, got ${l.sql}, ${r.sql}")
    }

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ic", this, classOf[SortedLongIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object TextShingles {
  /** Fused distinct word n-gram shingles (see [[WordShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Fused constant-set membership count (see [[TokenSetHits]]). */
  def tokenSetHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetHits(ColumnBridge.expression(toks), words))

  /** Fused distinct hashed shingles (see [[HashedWordShingles]]). */
  def hashedWordShingles(text: Column, n: Int, hashKind: String): Column =
    ColumnBridge.column(HashedWordShingles(ColumnBridge.expression(text), n, hashKind))

  /** Fused positional gram hashes (see [[PositionalGramHashes]]). */
  def positionalGramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(PositionalGramHashes(ColumnBridge.expression(text), n))

  /** Fused lowercase whitespace tokenizer (see [[WordTokens]]). */
  def wordTokens(text: Column): Column =
    ColumnBridge.column(WordTokens(ColumnBridge.expression(text)))

  /** Fused distinct (token, count) entries (see [[WordTokenCounts]]). */
  def wordTokenCounts(text: Column): Column =
    ColumnBridge.column(WordTokenCounts(ColumnBridge.expression(text)))

  /** Fused sorted-array intersection size (see
    * [[SortedLongIntersectCount]]). */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
