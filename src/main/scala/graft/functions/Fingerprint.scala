package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum rolling-hash over all k-char shingles of a string — the
  * 1-hash winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * — in ONE compiled pass.
  *
  * Replaces the earlier min-MD5-per-window form, whose cost WAS the
  * algorithm: one full MD5 (~dozens of rounds) per character position
  * per document. Here each window slide is a handful of integer ops:
  *
  *   v_i   = sum_{j<k} cp(i+j) * 31^(k-1-j)      (code-point polynomial)
  *   v_i+1 = (v_i - cp(i) * 31^(k-1)) * 31 + cp(i+k)   (O(1) slide)
  *   h_i   = (A * v_i + C) mod 2^61              (affine scramble)
  *
  * and the fingerprint is min_i h_i. The scramble decouples the min
  * from the lexicographic order of the windows (v alone would make
  * every document fingerprint on its alphabetically-smallest shingle).
  *
  * All arithmetic is EXACT and replayable by the DuckDB oracle:
  *  - code points are what DuckDB's unicode(substr(t,i,1)) returns and
  *    what UTF8String yields per character, so windows agree;
  *  - v fits a signed 64-bit integer with no overflow: cp < 2^21 and
  *    k <= 8 bound v < 2^21 * 31^7 * 31/30 < 2^57 (the require below
  *    enforces the k bound), and the slide's intermediate
  *    (v - cp*31^7)*31 stays under 2^62;
  *  - the scramble is computed mod 2^61: the JVM's wrapping 64-bit
  *    multiply-add masked to 61 bits equals the true product mod 2^61
  *    (2^61 divides 2^64), and DuckDB reproduces it exactly in HUGEINT:
  *    (A::HUGEINT * v + C) % 2305843009213693952;
  *  - A = 6364136223846793005 (Knuth MMIX multiplier, odd — the map is
  *    a bijection mod 2^61), C = 1442695040888963407;
  *  - fewer than k chars -> null.
  */
case class ShingleMinRoll(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8,
    s"shingle width must be in [1, 8] so the code-point polynomial stays exact in 64 bits, got $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingleMinRoll requires string, got ${t.sql}")
  }

  private val topPow: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p *= 31L; i += 1 }
    p // 31^(k-1)
  }

  @inline private def mix(v: Long): Long =
    (ShingleMinRoll.MixA * v + ShingleMinRoll.MixC) & ShingleMinRoll.Mask61

  /** Boxed so codegen/interpreted paths share one null-aware kernel. */
  def compute(t: UTF8String): java.lang.Long = {
    val n = t.numChars()
    if (n < k) return null
    var v = 0L
    var best = Long.MaxValue
    if (t.numBytes() == n) {
      // ASCII fast path: one code point per byte, hash in place
      val bytes = t.getBytes
      var i = 0
      while (i < k) { v = v * 31L + (bytes(i) & 0xFF); i += 1 }
      best = mix(v)
      i = k
      while (i < n) {
        v = (v - (bytes(i - k) & 0xFF) * topPow) * 31L + (bytes(i) & 0xFF)
        val h = mix(v)
        if (h < best) best = h
        i += 1
      }
    } else {
      // one UTF-8 sequence == one code point == one DuckDB "character"
      val cps = t.toString.codePoints.toArray
      var i = 0
      while (i < k) { v = v * 31L + cps(i); i += 1 }
      best = mix(v)
      i = k
      while (i < cps.length) {
        v = (v - cps(i - k).toLong * topPow) * 31L + cps(i)
        val h = mix(v)
        if (h < best) best = h
        i += 1
      }
    }
    java.lang.Long.valueOf(best)
  }

  override def nullSafeEval(input: Any): Any = {
    val r = compute(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fp", this, classOf[ShingleMinRoll].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      |java.lang.Long ${ev.value}_r = $self.compute($t);
      |${ev.isNull} = ${ev.value}_r == null;
      |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinRoll =
    copy(child = newChild)
}

object ShingleMinRoll {
  val MixA: Long = 6364136223846793005L
  val MixC: Long = 1442695040888963407L
  val Mask61: Long = (1L << 61) - 1
  val Mod61: Long = 1L << 61 // 2305843009213693952

  /** 31^(k-1-j) coefficients for the expanded (non-rolling) window
    * polynomial — what the DuckDB oracle and the spec's independent
    * reference implementation use. */
  def powers(k: Int): Seq[Long] =
    (0 until k).map(j => (0 until (k - 1 - j)).foldLeft(1L)((p, _) => p * 31L))

  /** DuckDB twin: the full fingerprint expression over `expr` (an
    * already-lowercased VARCHAR), shingle width k. */
  def duckdbSql(expr: String, k: Int = 8): String = {
    // ::BIGINT on every term: unicode() is INT32 and the small power
    // literals fit INT32 too — the product would overflow INT32
    val terms = powers(k).zipWithIndex.map { case (p, j) =>
      val pos = if (j == 0) "i" else s"i+$j"
      if (p == 1L) s"unicode(substr($expr, $pos, 1))::BIGINT"
      else s"unicode(substr($expr, $pos, 1))::BIGINT*$p"
    }.mkString(" + ")
    s"""CASE WHEN length($expr) >= $k
       |     THEN CAST(list_min([CAST(($MixA::HUGEINT * ($terms) + $MixC) % $Mod61 AS BIGINT)
       |                         for i in range(1, length($expr) - ${k - 2})])
       |          AS BIGINT)
       |     ELSE NULL END""".stripMargin
  }
}

object Fingerprint {
  /** Fused min-rolling-hash shingle fingerprint (see [[ShingleMinRoll]]). */
  def shingleMinRoll(t: Column, k: Int): Column =
    ColumnBridge.column(ShingleMinRoll(ColumnBridge.expression(t), k))
}
