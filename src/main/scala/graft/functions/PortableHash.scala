package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash family computable IDENTICALLY in Spark and in the DuckDB
  * oracle, so probabilistic operators (minhash, simhash) become fully
  * hash-comparable instead of rows-only checked.
  *
  * The 60-bit value is the first 15 hex chars of md5:
  *   Spark:  conv(substring(md5(s), 1, 15), 16, 10) cast long
  *   DuckDB: ('0x' || substring(md5(s), 1, 15))::BIGINT
  * Both md5 implementations emit identical lowercase hex; 15 nibbles
  * keep the value positive in a signed 64-bit long.
  *
  * Trade-off, chosen deliberately: md5 costs a few times more than
  * xxhash64, but hashing is never the bottleneck in these pipelines
  * (the pair-join shuffle is), and end-to-end verifiability of the
  * dedup operators is worth more than single-digit-percent throughput.
  * A deployment that wants xxhash64 swaps one function.
  */
object PortableHash {

  /** 60-bit portable hash of a string column. */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** The DuckDB SQL twin of [[md5Hash60]], for oracle builders. */
  def duckdbHash60(expr: String): String =
    s"('0x' || substring(md5($expr), 1, 15))::BIGINT"

  /** JVM-side twin of [[md5Hash60]] for fused expressions: the first
    * 15 hex chars of md5 as a long = 7 full bytes then the high
    * nibble of the 8th (bit-identical to `conv(substring(md5, 1, 15),
    * 16, 10)` — asserted in DedupSpec parity tests). */
  def md5Hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFF); i += 1 }
    (v << 4) | ((d(7) & 0xFF) >>> 4)
  }

  // ---- universal-hash family over a 30-bit base hash ----------------
  // One md5 per value, then h_i(x) = (a_i * x + b_i) mod (2^31 - 1):
  // with x < 2^30 and a_i, b_i < 2^31 the product stays under 2^61, so
  // plain signed-64-bit arithmetic is exact in BOTH engines — a 32-wide
  // minhash signature costs one md5 plus 32 integer fmas per posting
  // instead of 32 md5s.

  val UH_PRIME = 2147483647L // 2^31 - 1
  val UH_DOMAIN = 1073741824L // 2^30

  /** Deterministic (a_i, b_i) for family member i; a_i is never 0 mod p. */
  def uhConsts(i: Int): (Long, Long) = {
    val a = (1103515245L * (2 * i + 1) + 12345L) % UH_PRIME
    val b = (1103515245L * (2 * i + 2) + 12345L) % UH_PRIME
    (if (a == 0L) 1L else a, b)
  }

  /** 30-bit base hash of a string column (md5Hash60 folded into the
    * universal-hash domain). */
  def uhBase(s: Column): Column = md5Hash60(s) % UH_DOMAIN

  /** Family member i applied to a [[uhBase]] column. */
  def uhApply(i: Int, x: Column): Column = {
    val (a, b) = uhConsts(i)
    (lit(a) * x + lit(b)) % lit(UH_PRIME)
  }

  /** DuckDB twin of [[uhBase]]. */
  def duckdbUhBase(expr: String): String =
    s"(${duckdbHash60(expr)} % $UH_DOMAIN)"

  /** DuckDB twin of [[uhApply]]. */
  def duckdbUhApply(i: Int, expr: String): String = {
    val (a, b) = uhConsts(i)
    s"(($a * $expr + $b) % $UH_PRIME)"
  }
}
