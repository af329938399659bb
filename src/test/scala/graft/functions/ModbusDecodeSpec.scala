package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decode vectors hand-computed from the reference semantics
  * (modbus.py:58-166, FIXTURES.md §2): byteorder Big, wordorder Little
  * (r0 = low word) except ABB formats. */
class ModbusDecodeSpec extends AnyFunSuite with SparkSpec {
  import ModbusDecode._

  private def decodeOne(fmt: Int, regs: Seq[Int]): Option[Double] = {
    import spark.implicits._
    val df = Seq((fmt, regs)).toDF("fmt", "regs")
    val row = df.select(decode($"fmt", $"regs").as("v")).head()
    if (row.isNullAt(0)) None else Some(row.getDouble(0))
  }

  test("UINT16 decodes first register") {
    assert(decodeOne(MODBUS_UINT16, Seq(5, 0)).contains(5.0))
    assert(decodeOne(MODBUS_UINT16, Seq(65535)).contains(65535.0))
  }

  test("SINT16 sign-extends") {
    assert(decodeOne(MODBUS_SINT16, Seq(0xFFFB)).contains(-5.0))
    assert(decodeOne(MODBUS_SINT16, Seq(32767)).contains(32767.0))
    assert(decodeOne(MODBUS_SINT16, Seq(32768)).contains(-32768.0))
  }

  test("SINT32 little word order: r0 is the low word") {
    // -5 = 0xFFFFFFFB -> r0=0xFFFB (low), r1=0xFFFF (high)
    assert(decodeOne(MODBUS_SINT32, Seq(0xFFFB, 0xFFFF)).contains(-5.0))
    assert(decodeOne(MODBUS_SINT32, Seq(1, 2)).contains(131073.0))
  }

  test("SINT32_RWORDS decodes as plain SINT32 (reference modbus.py:132-133)") {
    assert(decodeOne(MODBUS_SINT32_RWORDS, Seq(0xFFFB, 0xFFFF)).contains(-5.0))
  }

  test("UINT32 little word order") {
    assert(decodeOne(MODBUS_UINT32, Seq(0xFFFF, 0xFFFF)).contains(4294967295.0))
    assert(decodeOne(MODBUS_UINT32, Seq(0, 0x8000)).contains(2147483648.0))
  }

  test("FLOAT: IEEE-754 from (r1<<16)|r0") {
    // 1.5f = 0x3FC00000
    assert(decodeOne(MODBUS_FLOAT, Seq(0x0000, 0x3FC0)).contains(1.5))
    // -2.25f = 0xC0100000
    assert(decodeOne(MODBUS_FLOAT, Seq(0x0000, 0xC010)).contains(-2.25))
    // smallest subnormal 0x00000001
    assert(decodeOne(MODBUS_FLOAT, Seq(1, 0))
      .contains(java.lang.Float.intBitsToFloat(1).toDouble))
    // +Inf / NaN
    assert(decodeOne(MODBUS_FLOAT, Seq(0, 0x7F80)).contains(Double.PositiveInfinity))
    assert(decodeOne(MODBUS_FLOAT, Seq(0, 0xFF80)).contains(Double.NegativeInfinity))
    assert(decodeOne(MODBUS_FLOAT, Seq(0, 0x7FC0)).exists(_.isNaN))
  }

  test("ABB_REAL32_U decodes only first register as u16 (modbus.py:156-157)") {
    assert(decodeOne(MODBUS_ABB_REAL32_U, Seq(7, 9)).contains(7.0))
  }

  test("ABB_REAL32_S reassembles r1||r0 as unsigned int (modbus.py:161-163)") {
    assert(decodeOne(MODBUS_ABB_REAL32_S, Seq(0x3412, 0x7856)).contains(0x78563412L.toDouble))
  }

  test("unimplemented formats yield null (modbus.py:135-154)") {
    for (f <- Seq(MODBUS_SKIP2, MODBUS_UINT32_RWORDS, MODBUS_FLOAT_SKIP2,
        MODBUS_FLOAT_RBYTES, MODBUS_FLOAT_RWORDS, MODBUS_FLOAT_RSKIP2)) {
      assert(decodeOne(f, Seq(1, 2, 3)).isEmpty, s"format $f")
    }
  }

  test("missing registers yield null, not an error") {
    assert(decodeOne(MODBUS_SINT32, Seq(7)).isEmpty)
    assert(decodeOne(MODBUS_FLOAT, Seq(7)).isEmpty)
    assert(decodeOne(MODBUS_UINT16, Seq.empty).isEmpty)
  }

  test("FORMAT_LENGTH table matches the reference (modbus.py:26-29)") {
    assert(formatLength(MODBUS_UINT16) == 4) // reference oddity kept verbatim
    assert(formatLength(MODBUS_ABB_REAL32_S) == 2)
    assert(formatLength.size == 14)
  }

  test("property: u16/s16/u32/s32/float round-trip through registers (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // One batched Spark job over 500 random encode->decode cases.
    val cases = (0 until 500).map { i =>
      val n = rnd.nextInt()
      val r0 = n & 0xFFFF
      val r1 = (n >>> 16) & 0xFFFF
      val fmt = Seq(MODBUS_UINT16, MODBUS_SINT16, MODBUS_SINT32,
        MODBUS_UINT32, MODBUS_FLOAT)(i % 5)
      val expected: Double = fmt match {
        case MODBUS_UINT16 => r0.toDouble
        case MODBUS_SINT16 => r0.toShort.toDouble
        case MODBUS_SINT32 => n.toDouble
        case MODBUS_UINT32 => (n.toLong & 0xFFFFFFFFL).toDouble
        case MODBUS_FLOAT => java.lang.Float.intBitsToFloat(n).toDouble
      }
      (i, fmt, Seq(r0, r1), expected)
    }
    val got = cases.toDF("i", "fmt", "regs", "expected")
      .withColumn("v", decode($"fmt", $"regs"))
      .select($"i", $"v", $"expected")
      .collect()
    got.foreach { row =>
      val (i, v, e) = (row.getInt(0), row.getDouble(1), row.getDouble(2))
      if (e.isNaN) assert(v.isNaN, s"case $i")
      else assert(v == e, s"case $i: got $v want $e")
    }
  }
}
