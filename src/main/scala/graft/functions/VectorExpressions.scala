package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  * oracle parity is preserved). Extra elements beyond the shorter
  * input are ignored; embeddings are fixed-width so lengths always
  * match in practice.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs are engine-constructed array<double> columns (the
  // ExpectsInputTypes mixin's type class is private[sql]); the Column
  // wrapper below is the only construction path.
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
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
