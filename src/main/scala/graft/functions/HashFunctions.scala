package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything is built on md5 rather than Spark's `hash`/`xxhash64` so
  * that results are reproducible in ANY engine (the DuckDB oracle, a
  * different Spark version, a downstream consumer): md5 is specified,
  * murmur seeds are not. All expressions are built-in Catalyst functions
  * → whole-stage codegen, no UDFs.
  */
object HashFunctions {

  /** Mersenne prime 2^31 − 1: modulus for the minhash permutation
    * family. a·(h mod p) + b stays < 2^62 — no int64 overflow.
    */
  val Prime: Long = 2147483647L

  /** Stable non-negative 60-bit hash of a column: the first 15 hex chars
    * of md5, base-16-decoded.
    */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** One member of the `(a·x + b) mod p` permutation family applied to a
    * 60-bit hash column.
    */
  def permuted(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % lit(Prime)) + lit(b)) % lit(Prime)

  /** Deterministic (a, b) pairs for `k` minhash permutations. */
  def permutationSeeds(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (Prime - 1) + 1,
      math.abs(rnd.nextLong()) % Prime))
  }
}
