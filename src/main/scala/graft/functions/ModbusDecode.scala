package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Register-format decode layer (reference: modbus.py:58-166) expressed
  * as pure Catalyst column expressions over an `ArrayType(IntegerType)`
  * column of raw 16-bit register words — no UDFs, so the whole decode
  * stays inside WholeStageCodegen and vectorizes at scale.
  *
  * Semantics mirror the reference exactly:
  *   - byte order Big for all formats; word order Little except the ABB
  *     vendor formats which are Big (modbus.py:61-115) — so for 32-bit
  *     formats the FIRST register is the LEAST significant word:
  *     value bits = (r1 << 16) | r0.
  *   - SINT32_RWORDS decodes as plain SINT32 — the reference never
  *     applies the word reversal (modbus.py:132-133).
  *   - ABB_REAL32_U decodes only the first register as u16
  *     (modbus.py:156-157); ABB_REAL32_S reassembles r1‖r0 as an
  *     UNSIGNED 32-bit integer, not a float (modbus.py:161-163).
  *   - SKIP2, UINT32_RWORDS and the four FLOAT_R* variants are declared
  *     but unimplemented in the reference (modbus.py:135-154) and yield
  *     NULL — we replicate the spec (null), not the accident.
  */
object ModbusDecode {

  // Format codes (reference modbus.py:11-24).
  val MODBUS_SINT16 = 0
  val MODBUS_SINT32 = 1
  val MODBUS_SINT32_RWORDS = 2
  val MODBUS_SKIP2 = 3
  val MODBUS_UINT16 = 4
  val MODBUS_UINT32 = 5
  val MODBUS_UINT32_RWORDS = 6
  val MODBUS_FLOAT = 7
  val MODBUS_FLOAT_SKIP2 = 8
  val MODBUS_FLOAT_RBYTES = 9
  val MODBUS_FLOAT_RWORDS = 10
  val MODBUS_FLOAT_RSKIP2 = 11
  val MODBUS_ABB_REAL32_U = 12
  val MODBUS_ABB_REAL32_S = 13

  /** Registers to read from the device per format — the reference's
    * FORMAT_LENGTH table verbatim, including its oddity that e.g.
    * UINT16 reads 4 registers while the decode consumes 1
    * (modbus.py:26-29). */
  val formatLength: Map[Int, Int] = Map(
    MODBUS_SINT16 -> 1, MODBUS_SINT32 -> 2, MODBUS_SINT32_RWORDS -> 2,
    MODBUS_SKIP2 -> 3, MODBUS_UINT16 -> 4, MODBUS_UINT32 -> 5,
    MODBUS_UINT32_RWORDS -> 6, MODBUS_FLOAT -> 7, MODBUS_FLOAT_SKIP2 -> 8,
    MODBUS_FLOAT_RBYTES -> 9, MODBUS_FLOAT_RWORDS -> 10,
    MODBUS_FLOAT_RSKIP2 -> 11, MODBUS_ABB_REAL32_U -> 2,
    MODBUS_ABB_REAL32_S -> 2)

  /** IEEE-754 binary32 value from its bit pattern (a long in [0, 2^32)),
    * built from exact double arithmetic so it is codegen-friendly and
    * bit-faithful: every float is exactly representable as a double and
    * every operation below is exact (powers of two, <=24-bit mantissa
    * products). Inf/NaN map to Double.Inf/NaN as Python's float would. */
  def float32FromBits(bits: Column): Column = {
    val b = bits.cast(LongType)
    val sign = when(b.bitwiseAND(lit(0x80000000L)) =!= lit(0L), lit(-1.0)).otherwise(lit(1.0))
    val e = shiftright(b, 23).bitwiseAND(lit(0xFFL))
    val frac = b.bitwiseAND(lit(0x7FFFFFL))
    when(e === lit(255L),
        when(frac === lit(0L), sign * lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NaN)))
      .when(e === lit(0L), sign * frac.cast(DoubleType) * lit(math.pow(2, -149)))
      .otherwise(
        sign * (lit(1.0) + frac.cast(DoubleType) * lit(math.pow(2, -23)))
          * pow(lit(2.0), e.cast(DoubleType) - lit(127.0)))
  }

  /** Sign-extend an unsigned 16-bit word. Replicates the intent of the
    * reference's buscommon.get_signed_number (buscommon.py:12-19). */
  def signExtend16(u: Column): Column =
    when(u >= lit(32768L), u - lit(65536L)).otherwise(u)

  /** Sign-extend an unsigned 32-bit value. */
  def signExtend32(u: Column): Column =
    when(u >= lit(2147483648L), u - lit(4294967296L)).otherwise(u)

  /** Decode raw register words to a DoubleType value per the reference's
    * 14 format codes; `format` is an integer column, `regs` an
    * ArrayType(IntegerType) column. Missing registers (array too short)
    * and unimplemented formats yield null — the reference's nullable
    * value semantics (SURVEY.md §1.3). */
  def decode(format: Column, regs: Column): Column = {
    val r0 = try_element_at(regs, lit(1)).cast(LongType)
    val r1 = try_element_at(regs, lit(2)).cast(LongType)
    val u32le = shiftleft(r1, 16).bitwiseOR(r0) // word order Little: r0 = low word
    when(format === lit(MODBUS_SINT16), signExtend16(r0).cast(DoubleType))
      .when(format === lit(MODBUS_SINT32) || format === lit(MODBUS_SINT32_RWORDS),
        signExtend32(u32le).cast(DoubleType))
      .when(format === lit(MODBUS_UINT16) || format === lit(MODBUS_ABB_REAL32_U),
        r0.cast(DoubleType))
      .when(format === lit(MODBUS_UINT32) || format === lit(MODBUS_ABB_REAL32_S),
        u32le.cast(DoubleType))
      .when(format === lit(MODBUS_FLOAT), float32FromBits(u32le))
      .otherwise(lit(null).cast(DoubleType))
  }
}
