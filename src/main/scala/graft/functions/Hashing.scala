package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing used across the engine.
  *
  * The reference sieve keys URLs with a 64-bit string hash
  * (`/root/reference/src/clj/ramper/util/url.clj:81-85`,
  * `util.clj:123-126`); we standardize on Spark's built-in
  * `xxhash64` (seed 42) so the Scala-side hash (used by the
  * deterministic synthetic web) and the Catalyst-side
  * `functions.xxhash64(col)` (used in dataframe plans) agree
  * bit-for-bit — one hash space end to end, as the north rule's
  * "seen set keyed by canonicalized-URL xxHash64" requires.
  */
object Hashing {

  /** Spark's xxhash64 seed — must match functions.xxhash64. */
  final val XxSeed = 42L

  /** Same value as functions.xxhash64(lit(s)) for a non-null string. */
  def xxhash64(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, XxSeed)

  /** Same value as functions.xxhash64 applied to a LongType column. */
  def xxhash64Long(x: Long): Long =
    XxHash64Function.hash(java.lang.Long.valueOf(x), org.apache.spark.sql.types.LongType, XxSeed)

  /** splitmix64 — tiny, high-quality PRNG step; used to derive
    * deterministic per-URL pseudo-random streams (link targets,
    * status codes, pixel noise) from a single 64-bit seed.
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** A bounded stream of n splitmix64 draws from a seed. */
  def splitmixStream(seed: Long, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var s = seed
    var i = 0
    while (i < n) { s = splitmix64(s); out(i) = s; i += 1 }
    out
  }

  /** Non-negative modulo. */
  def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  /** Polynomial char hash over a fixed-width k-gram, oracle-expressible:
    * sum of ascii(c_i) * 31^(k-1-i). Used by MinHash/SimHash so the
    * DuckDB oracle can reproduce it with flat SQL (no loops).
    */
  def gramHash(g: String): Long = {
    var h = 0L
    var i = 0
    while (i < g.length) { h = h * 31 + g.charAt(i).toInt; i += 1 }
    h
  }

  /** MinHash permutation j applied to a gram hash:
    * (a_j * h + b_j) mod P with fixed odd multipliers — identical
    * arithmetic is emitted into the oracle SQL.
    */
  final val MinHashP = 1000000007L
  def minhashPerm(j: Int, gh: Long): Long =
    pmod((2 * j + 1).toLong * pmod(gh, MinHashP) + 12582917L * (j + 1), MinHashP)
}
