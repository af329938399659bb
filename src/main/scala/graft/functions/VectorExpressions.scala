package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The built-in formulation `aggregate(zip_with(a, b, *), 0d, +)` is
  * semantically right but materializes the zipped array per row before
  * folding — on a pairwise similarity join that's an allocation per
  * candidate pair. This expression generates a single fused loop
  * (doGenCode), keeping the pair loop allocation-free; the preference
  * ladder is built-ins > native Expression > UDF (spark_guide.md), and
  * this is the one hot path where the built-in shape measurably loses.
  *
  * The accumulation order is the same strict left-to-right double sum
  * as the fold it replaces, so results are bit-identical (the DuckDB
  * oracle parity is preserved). Length-mismatched inputs return null,
  * exactly like the fold (`zip_with` pads the shorter array with
  * nulls, and a null element nulls the whole sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Non-array / non-double inputs fail at ANALYSIS time (the
    * ExpectsInputTypes mixin's type class is private[sql], so the
    * check is hand-rolled). */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dotProduct requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true // pre-analysis unknown: stay conservative
  })

  /** Null like the fold it replaces: a null ELEMENT nulls the sum
    * (null * x + ... propagates in `aggregate(zip_with(...))`), and so
    * does a LENGTH MISMATCH (zip_with pads with nulls) — the latter is
    * data-dependent, so the result is always nullable. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // ev.isNull is always a real variable (nullable == true), so both
      // guards can set it; containsNull=false inputs still get the
      // guard-free tight inner loop
      val guard =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $guard
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Fused dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
