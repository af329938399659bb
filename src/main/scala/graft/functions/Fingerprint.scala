package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 over all k-char shingles of a string — the 1-hash
  * winnowing fingerprint — in ONE compiled pass, replacing
  *
  *   array_min(transform(sequence(1, len - k + 1),
  *     i => md5(substring(t, i, k))))
  *
  * whose transform HOF is CodegenFallback AND materializes one 32-char
  * hex string per character position before array_min scans them (a
  * 1000-char doc allocates ~993 UTF8Strings to keep one).
  *
  * Bit-identical results (TextAnalysisSpec asserts vs the HOF form):
  *  - windows are CHARACTER windows (UTF8String.substringSQL
  *    semantics; an ASCII fast path hashes byte slices in place —
  *    identical bytes by definition of UTF-8);
  *  - digests are compared as UNSIGNED 16-byte arrays, which orders
  *    exactly like the lowercase-hex strings array_min compares (hex
  *    encoding is monotone per byte), and only the winner is
  *    hex-encoded;
  *  - fewer than k chars -> null (the `when(length >= k)` arm).
  */
case class ShingleMinMd5(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"shingle width must be positive, got $k")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingleMinMd5 requires string, got ${t.sql}")
  }

  def compute(t: UTF8String): UTF8String = {
    val nChars = t.numChars()
    if (nChars < k) return null
    // MessageDigest is not thread-safe and expression instances are
    // shared across local-mode tasks: one instance per ROW (not per
    // window — digest() resets it for reuse across the loop)
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    if (t.numBytes() == nChars) {
      // ASCII fast path: char windows == byte windows; hash slices of
      // the backing bytes with zero per-window allocation
      val bytes = t.getBytes
      var i = 0
      while (i <= nChars - k) {
        md.update(bytes, i, k)
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
    } else {
      var i = 1
      while (i <= nChars - k + 1) {
        val d = md.digest(t.substringSQL(i, k).getBytes)
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
    }
    UTF8String.fromString(hex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val digits = "0123456789abcdef"
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = digits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = digits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fp", this, classOf[ShingleMinMd5].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      |${ev.value} = $self.compute($t);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinMd5 =
    copy(child = newChild)
}

object Fingerprint {
  /** Fused min-md5 shingle fingerprint (see [[ShingleMinMd5]]). */
  def shingleMinMd5(t: Column, k: Int): Column =
    ColumnBridge.column(ShingleMinMd5(ColumnBridge.expression(t), k))
}
