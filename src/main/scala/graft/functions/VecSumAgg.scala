package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise QUANTIZED vector sum as one native aggregate: for an
  * array<double> column, per position i it accumulates
  * `sum(floor(x_i * 1e6) as long)` and the count of rows that HAVE a
  * position i. This is the exact-integer centroid-mean kernel every
  * trained-index build runs per Lloyd round ([[graft.ops.Similarity]]
  * kmeansCells, and the PQ subspace codebooks) — previously a
  * 64x `posexplode` row fan-out into a (cell, pos) hash aggregate and
  * a second (cell) aggregate to reassemble the vector. The agg
  * replaces that with one in-row while-loop per vector and ONE
  * aggregate per round: same exact integers (long adds are
  * order-insensitive, hence partition-portable — the property the
  * whole quantized-mean design exists for), ~dim-fold fewer aggregate
  * input rows, one fewer shuffle per round.
  *
  * Per-position counts (not one row count) reproduce the explode
  * form's semantics exactly: a short row contributes to positions it
  * has, a NULL element is skipped by the sum but still counted (the
  * explode form's `count(lit(1))` counts the row at that position
  * while `sum` skips its NULL), a position whose EVERY row is NULL
  * yields a NULL sum (a `sum()` over only NULLs is NULL, not 0 — a
  * per-position non-null tally distinguishes it from a true zero sum),
  * and a NULL array contributes nothing at all. Buffers grow to the
  * longest row seen, so ragged corpora keep the explode form's
  * per-position denominators.
  *
  * Output: struct(sums array<long>, counts array<long>); the caller
  * divides `sums / (counts * 1e6)` to get the quantized mean — the
  * single deterministic double division the oracle replays.
  */
case class QuantVecSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantVecSumAgg.Buf] {

  import QuantVecSumAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = true), nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantVecSum requires array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](0), new Array[Long](0), new Array[Long](0))

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = buf.grow(n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        b.sums(i) += math.floor(arr.getDouble(i) * 1e6).toLong
        b.nonNull(i) += 1L
      }
      b.counts(i) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val m = a.grow(b.sums.length)
    var i = 0
    while (i < b.sums.length) {
      m.sums(i) += b.sums(i)
      m.counts(i) += b.counts(i)
      m.nonNull(i) += b.nonNull(i)
      i += 1
    }
    m
  }

  override def eval(buf: Buf): Any =
    InternalRow(
      // an all-NULL position is a NULL sum, exactly like sum() over
      // only NULLs in the explode form — not a zero
      new GenericArrayData(buf.sums.indices.map(i =>
        if (buf.nonNull(i) == 0L) null else (buf.sums(i): Any)).toArray),
      new GenericArrayData(buf.counts.map(l => l: Any)))

  override def serialize(buf: Buf): Array[Byte] = {
    val n = buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putLong(buf.sums(i)); bb.putLong(buf.counts(i))
      bb.putLong(buf.nonNull(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Buf(new Array[Long](n), new Array[Long](n), new Array[Long](n))
    var i = 0
    while (i < n) {
      b.sums(i) = bb.getLong(); b.counts(i) = bb.getLong()
      b.nonNull(i) = bb.getLong(); i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantVecSumAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "quant_vec_sum"
}

object QuantVecSumAgg {
  /** Mutable (sums, counts, non-null counts) triple; grows to the
    * longest vector seen. */
  final class Buf(var sums: Array[Long], var counts: Array[Long],
      var nonNull: Array[Long]) {
    def grow(n: Int): Buf = {
      if (n > sums.length) {
        sums = java.util.Arrays.copyOf(sums, n)
        counts = java.util.Arrays.copyOf(counts, n)
        nonNull = java.util.Arrays.copyOf(nonNull, n)
      }
      this
    }
  }

  /** Aggregate column over an array<double> vector column: see
    * [[QuantVecSumAgg]]. */
  def quantVecSum(v: Column): Column =
    ColumnBridge.column(
      QuantVecSumAgg(ColumnBridge.expression(v)).toAggregateExpression())
}
