package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** SimHash signature as ONE native aggregate over (doc, token-hash)
  * rows: the buffer is the per-bit ones-count vector plus the token
  * count, update is `bits` shift-mask-adds, merge is a vector add, and
  * eval emits the 4-chunk majority-vote signature directly
  * (chunk c = fold over its bits of [2*ones > n]).
  *
  * This replaces the declarative packed-counter pipeline (a 16-column
  * projection + 16 `sum`s + a 60-term reconstruction): the vote math
  * is identical — exact integer counters, votes[i] = 2*ones[i] - n —
  * so signatures are bit-identical (DedupSpec asserts agg == scalar
  * form), but the plan compiles two small codegen units instead of
  * several large ones (the packed form's Janino time exceeded its
  * execution time) and int counters remove the packed form's 2^14
  * tokens-per-doc overflow ceiling (reference capacity: 2^31).
  *
  * Null token hashes are ignored (never produced by the md5/xxhash
  * paths). Zero rows for a group cannot occur (groups exist only for
  * observed rows).
  */
case class SimHashSigAgg(
    child: Expression,
    weight: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  require(bits > 0 && bits <= 64 && bits % 4 == 0,
    s"bits must be in (0,64] and split into 4 chunks, got $bits")
  private val chunkWidth = bits / 4

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (c, w) => TypeCheckResult.TypeCheckFailure(
        s"simhashSig requires (long token-hash, int weight), got (${c.sql}, ${w.sql})")
    }

  // buffer = ones-counts for bits [0, bits) ++ token count at [bits]
  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits + 1)

  // a (hash, weight) row votes exactly like `weight` occurrence rows
  // of that hash: per-bit ones-counts and the token total both scale
  // by the weight, so count-collapsed inputs produce bit-identical
  // signatures (majority vote is count-weighted by definition)
  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val h = v.asInstanceOf[Long]
      val c = w.asInstanceOf[Int]
      var i = 0
      while (i < bits) {
        buf(i) += ((h >>> i) & 1L).toInt * c
        i += 1
      }
      buf(bits) += c
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i <= bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val n = buf(bits)
    val out = new Array[Any](4)
    var c = 0
    while (c < 4) {
      var acc = 0
      var j = 0
      while (j < chunkWidth) {
        val i = chunkWidth * c + j // vote > 0  <=>  2*ones > n
        acc = acc * 2 + (if (2L * buf(i) > n) 1 else 0)
        j += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * (bits + 1))
    var i = 0
    while (i <= bits) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Int](bits + 1)
    var i = 0
    while (i <= bits) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSigAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}

object SimHashAgg {
  /** Aggregate column: 4-chunk SimHash signature over a long
    * token-hash column, one row per occurrence (see [[SimHashSigAgg]]). */
  def simhashSig(h: Column, bits: Int): Column =
    simhashSigWeighted(h, org.apache.spark.sql.functions.lit(1), bits)

  /** Count-weighted form: one row per DISTINCT token with its
    * occurrence count — bit-identical signatures at ~5-10x fewer
    * upstream hash evaluations on natural text. */
  def simhashSigWeighted(h: Column, cnt: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashSigAgg(ColumnBridge.expression(h), ColumnBridge.expression(cnt),
        bits).toAggregateExpression())
}
