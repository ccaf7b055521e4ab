package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Seeded universal hash family over the mod-prime domain of [[RollingHash]]:
  * `h_i(x) = (a_i·x + b_i) mod P` with P = 1e9+7.
  *
  * Why this family (and not xxhash64): every h_i is plain 64-bit-safe integer
  * arithmetic on a value the DuckDB oracle can also compute (the Karp–Rabin
  * fold, see RollingHash), so MinHash signatures (q44) and SimHash bit
  * generators (q48) become differentially testable instead of rows-only.
  * Statistically it is a textbook 2-universal family (Carter–Wegman), which is
  * what MinHash needs from its permutations.
  *
  * Overflow safety: a_i < 2^31 and x < P < 2^30, so a_i·x < 2^61 and
  * a_i·x + b_i stays far inside a signed 64-bit long — no wrapping anywhere,
  * which is exactly why DuckDB (which raises on BIGINT overflow) can replicate
  * it.
  *
  * The per-seed constants derive from a splitmix64-style mix of the seed —
  * deterministic across JVMs/engines/runs, no java.util.Random.
  */
object HashFamily {
  val P = 1000000007L

  private def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Multiplier for seed i: odd, in [1, 2^31). */
  def a(i: Int): Long = (mix(2L * i) >>> 33) | 1L

  /** Offset for seed i: in [0, P). */
  def b(i: Int): Long = (mix(2L * i + 1) >>> 34) % P

  /** Spark-side h_i over a non-negative long column (e.g. a RollingHash). */
  def affine(i: Int)(x: Column): Column = (lit(a(i)) * x + lit(b(i))) % lit(P)

  /** DuckDB-side h_i over a SQL expression producing the same non-negative
    * BIGINT. Constants are CAST to BIGINT because DuckDB integer literals are
    * INT32 and would overflow in the multiply. */
  def affineSql(i: Int, x: String): String =
    s"(CAST(${a(i)} AS BIGINT) * $x + ${b(i)}) % $P"
}
