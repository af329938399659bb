package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The h-wide minhash signature of a 30-bit gram-hash SET, in one
  * compiled pass — slot i = min over the set of the universal-hash
  * family member h_i(x) = (a_i * x + b_i) mod (2^31 - 1)
  * ([[PortableHash.uhConsts]]; x < 2^30 keeps the product exact in
  * signed 64-bit, the identical arithmetic the DuckDB oracle replays).
  *
  * Replaces the h `min(uhApply(i, x))` aggregate columns over exploded
  * postings — that form shuffled every posting into a groupBy purely
  * to fold per-doc minima that an in-row loop over the (already
  * in-row) hash array computes directly; with it, the signature stage
  * of the minhash pipeline needs NO exchange at all. Values are
  * bit-identical (same constants, same exact integer arithmetic;
  * DedupSpec asserts slot-for-slot equality with the aggregate form).
  *
  * Empty input arrays are the caller's responsibility to filter
  * (a doc with no grams has no signature — the aggregate form simply
  * produced no row); this expression returns null for them so a
  * missed filter surfaces as nulls, not as MaxValue signatures. */
case class MinhashSlots(child: Expression, h: Int) extends UnaryExpression {
  require(h > 0, s"signature width must be positive, got $h")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhashSlots requires array<bigint>, got ${t.sql}")
  }

  // flat (a_i, b_i) constant tables, rebuilt per JVM from the seeds
  @transient private lazy val as: Array[Long] =
    Array.tabulate(h)(i => PortableHash.uhConsts(i)._1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(h)(i => PortableHash.uhConsts(i)._2)

  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n == 0) return null
    val out = new Array[Long](h)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j)
      var i = 0
      while (i < h) {
        val v = (as(i) * x + bs(i)) % PortableHash.UH_PRIME
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhash", this, classOf[MinhashSlots].getName)
    nullSafeCodeGen(ctx, ev, xs => s"""
      |${ev.value} = $self.compute($xs);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSlots =
    copy(child = newChild)
}

object MinhashSlots {
  /** Fused h-slot minhash signature of a gram-hash array. */
  def minhashSlots(xs: Column, h: Int): Column =
    ColumnBridge.column(MinhashSlots(ColumnBridge.expression(xs), h))
}
