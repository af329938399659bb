package graft.functions

/** The engine's integer-bit surprisal kernel, JVM side:
  * `floor(log2(d / n))` for `1 <= n <= d` as an exact long — the
  * shared scalar twin of the column-algebra form
  * (`length(bin(d)) - length(bin(n))` corrected by one
  * shift-compare) that the LM / DSIR / NB oracles replay in DuckDB.
  *
  * Construction: candidate `k0 = bitlen(d) - bitlen(n)`; the true
  * floor is `k0` when `n << k0 <= d`, else `k0 - 1`. Exact over the
  * WHOLE positive-long domain: `n <= d` gives `k0 in [0, 62]`, and
  * `n << k0` has exactly `bitlen(d) <= 63` bits, so the single shift
  * never overflows — unlike an incrementing-shift probe loop
  * (`while ((n << (k+1)) <= d)`), which fails to terminate for
  * `d >= 2^62` (a left shift past bit 63 goes negative and passes
  * `<=`, and Java masks shift amounts mod 64). */
object IntBits {

  /** floor(log2(d / n)), exact, for 1 <= n <= d < 2^63. */
  @inline def bits(n: Long, d: Long): Long = {
    val k0 = java.lang.Long.numberOfLeadingZeros(n) -
      java.lang.Long.numberOfLeadingZeros(d)
    if ((n << k0) <= d) k0.toLong else (k0 - 1).toLong
  }
}
