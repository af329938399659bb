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

/** All `bands * r` hyperplane sign tests of the banded-LSH blocking in
  * ONE expression — a (bands*r) x dim constant matrix-vector product
  * emitting the packed band bucket array (band b -> b * 2^r + bits).
  *
  * Why not 64 [[DotProduct]] columns: a projection holding 64 inlined
  * dot loops compiles into a consume() method past HotSpot's
  * 8000-bytecode JIT ceiling, so the generated class executes in the
  * BYTECODE INTERPRETER — measured ~40x slower per dot than the same
  * loop JIT-compiled. One expression keeps the method small and the
  * plane matrix a flat primitive array.
  *
  * The planes are the engine's portable LCG family on flat index
  * p * 2^20 + i (exact integer arithmetic, exact power-of-two scaling)
  * — identical doubles in the DuckDB oracle — and the per-plane
  * accumulation is the same strict left-to-right double sum as
  * [[DotProduct]], so sign bits are bit-identical to the column form
  * (SimilaritySpec asserts it). Null array or dim mismatch -> null. */
case class HyperplaneBandBuckets(child: Expression, dim: Int, bands: Int, r: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplaneBandBuckets requires array<double>, got ${t.sql}")
  }

  // flat (bands*r) x dim plane matrix; rebuilt per JVM from the seed
  // arithmetic (nothing but 4 ints serializes with the plan)
  @transient private lazy val planes: Array[Double] = {
    val m = new Array[Double](bands * r * dim)
    var p = 0
    while (p < bands * r) {
      var i = 0
      while (i < dim) {
        m(p * dim + i) =
          ((1103515245L * (p.toLong * 1048576L + i) + 12345L) % 2147483648L)
            .toDouble / 2.147483648E9 - 0.5
        i += 1
      }
      p += 1
    }
    m
  }

  def compute(v: ArrayData): ArrayData = {
    if (v.numElements() != dim) return null
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = b
      var q = 0
      while (q < r) {
        val p = b * r + q
        var s = 0.0
        var i = 0
        while (i < dim) {
          if (v.isNullAt(i)) return null
          s += v.getDouble(i) * planes(p * dim + i)
          i += 1
        }
        bucket = bucket * 2 + (if (s >= 0.0) 1 else 0)
        q += 1
      }
      out(b) = bucket
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call into the JIT-friendly compute loop; the matrix
    // lives in the referenced expression instance
    val self = ctx.addReferenceObj("hpbb", this, classOf[HyperplaneBandBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $self.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandBuckets =
    copy(child = newChild)
}

/** Bitwise fingerprint of a float vector: the 4-byte big-endian IEEE
  * bits of each element, with -0.0 collapsed onto +0.0 and NaNs
  * canonicalized (floatToIntBits) — so bytes-equal <=> float-equal
  * under SQL grouping semantics, exactly the equivalence Spark's own
  * NormalizeFloatingNumbers establishes before keying on a float array.
  *
  * Why it exists: grouping/windowing BY the raw `array<float>` column
  * makes NormalizeFloatingNumbers wrap the key in
  * `knownfloatingpointnormalized(transform(...))` — a CodegenFallback
  * higher-order function that the generated SpecificOrdering then
  * EVALUATES TWICE PER SORT COMPARISON. Observed on dd_embed_cos's
  * exact-vector collapse: the windowed corpus sorts by that wrapped
  * key in every branch that reads the window, each comparison paying
  * two interpreted per-element lambdas — and at small scale AQE
  * coalesces the stage to one partition, serializing all of it into a
  * single straggler task (minutes for a corpus the same query joins in
  * seconds). Keying on this BINARY column instead keeps the exchange a
  * byte-hash and the sort a memcmp, with the normalization evaluated
  * ONCE per row in a codegen'd projection. */
case class FloatVectorBytes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"floatVectorBytes requires array<float>, got ${t.sql}")
  }

  // 5 bytes per element: a presence marker then the 4 IEEE bytes
  // (zeros under a null). An earlier version mapped any null ELEMENT to
  // a null KEY, which silently merged distinct null-carrying vectors
  // ([1.0, null] and [2.0, null] became one group) — grouping by the
  // raw array keeps them apart (null elements compare equal only to
  // null, in the SAME position), and this key must too. The marker
  // byte keeps the encoding injective: equal bytes <=> same length,
  // same null positions, same normalized floats elsewhere. All
  // elements share the fixed 5-byte stride, so no cross-length
  // prefix ambiguity exists.
  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n * 5)
    var i = 0
    while (i < n) {
      val o = i * 5
      if (v.isNullAt(i)) {
        out(o) = 0 // null marker; the 4 value bytes stay zero
      } else {
        var f = v.getFloat(i)
        if (f == 0f) f = 0f // -0.0f == 0.0f, so this collapses the sign
        val bits = java.lang.Float.floatToIntBits(f) // canonical NaN
        out(o) = 1
        out(o + 1) = (bits >>> 24).toByte
        out(o + 2) = (bits >>> 16).toByte
        out(o + 3) = (bits >>> 8).toByte
        out(o + 4) = bits.toByte
      }
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fvb", this, classOf[FloatVectorBytes].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $self.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVectorBytes =
    copy(child = newChild)
}

/** Symmetric int8 quantization codes of an array<double> vector in ONE
  * fused expression: `scale = maxabs > 0 ? 127 / maxabs : 0`,
  * `code_i = floor(x_i * scale + 0.5)` (int-valued doubles, so the
  * downstream [[DotProduct]] consumes them unchanged and the code dot
  * stays exact).
  *
  * Why it exists: the declarative form is three chained higher-order
  * transforms (abs-max, code mapping) — each CodegenFallback, each an
  * interpreted per-element lambda — sitting in the FIRST-PASS scan of
  * the ADC ANN path, i.e. the one stage that touches every corpus row.
  * This expression is two tight primitive loops behind one virtual
  * call, JIT-compiled like the other fused vector ops.
  *
  * Bit-compatibility: same maxabs comparison, same exactly-rounded
  * divide / multiply / add / floor sequence as the HOF form, so codes
  * are bit-identical (SimilaritySpec asserts it) and the DuckDB oracle
  * replays unchanged — for inputs without null ELEMENTS, which is all
  * the parity spec covers. Null array -> null like the HOF form; a
  * null ELEMENT nulls the ENTIRE output array, deliberately diverging
  * from the HOF chain (transform maps null -> null element, array_max
  * skips nulls, so the HOF form yields an array CONTAINING null): a
  * vector with a missing component has no meaningful code array, and
  * containsNull = false lets downstream DotProduct skip per-element
  * null checks in its hot loop. */
case class Int8QuantCodes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8QuantCodes requires array<double>, got ${t.sql}")
  }

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val a = Math.abs(v.getDouble(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = if (maxabs > 0) 127.0 / maxabs else 0.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = Math.floor(v.getDouble(i) * scale + 0.5)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("i8qc", this, classOf[Int8QuantCodes].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $self.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantCodes =
    copy(child = newChild)
}

object VectorExpressions {
  /** Fused dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused int8 quantization codes (see [[Int8QuantCodes]]). */
  def int8QuantCodes(v: Column): Column =
    ColumnBridge.column(Int8QuantCodes(ColumnBridge.expression(v)))

  /** Bitwise binary fingerprint of an array<float> column — the
    * grouping-safe exact-equality key (see [[FloatVectorBytes]]). */
  def floatVectorBytes(v: Column): Column =
    ColumnBridge.column(FloatVectorBytes(ColumnBridge.expression(v)))

  /** Banded hyperplane-LSH bucket array in one fused matrix-vector
    * expression (see [[HyperplaneBandBuckets]]). */
  def hyperplaneBandBuckets(v: Column, dim: Int, bands: Int, r: Int): Column =
    ColumnBridge.column(HyperplaneBandBuckets(
      ColumnBridge.expression(v), dim, bands, r))
}
