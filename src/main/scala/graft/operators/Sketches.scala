package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, the
  * implementation Spark ships): the 100-TB answer to "distinct users
  * per key, updated daily". Exact distinct needs a corpus-wide shuffle
  * per question; a sketch is computed ONCE per partition/day/source in
  * one pass, stored as a few-KB binary, and any union of days/sources
  * is answered later by merging register states — no re-scan, and the
  * merge is associative + commutative so increments compose in any
  * order.
  *
  * Estimates are deterministic for a given input SET (HLL register
  * state is order-independent), but engine-specific — DuckDB's HLL is
  * a different implementation — so this surface is spec-verified
  * (SketchesSpec: accuracy, mergeability, increment==full-recompute)
  * rather than oracle-hashed, like the other engine-internal ops
  * (C21, C22, C24).
  */
object Sketches {

  /** One HLL sketch per group: (keys..., `sketch` binary, one row per
    * group). `lgK` = log2 of register count (12 → 4 KiB, ~1.6% rel.
    * std. err.). Map-side partial aggregation applies — the shuffle
    * carries partial sketches, not values.
    */
  def groupDistinctSketch(df: DataFrame, keys: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "groupDistinctSketch needs grouping keys")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
  }

  /** Merge sketch rows (e.g. daily increments) back to one sketch per
    * group — pure register-max, no data re-scan.
    */
  def mergeSketches(df: DataFrame, keys: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("sketch"))

  /** Readback: keys + `n_distinct_est` (long) from a sketch frame. */
  def estimate(df: DataFrame, sketchCol: String = "sketch"): DataFrame =
    df.withColumn("n_distinct_est",
        hll_sketch_estimate(col(sketchCol)))
      .drop(sketchCol)

  /** Approximate heavy hitters over whitespace terms (Spark's
    * `approx_top_k` — a mergeable DataSketches frequent-items sketch):
    * (`term`, `term_count`) for the `k` most frequent, ranked by
    * count desc then term asc. The exact formulation
    * ([[CorpusScrub.topTerms]]) shuffles one row per distinct term —
    * the right call when terms fit a shuffle; at 100 TB the sketch
    * version is one bounded-size state per partition, merged once, no
    * term-keyed exchange at all. Guarantee: while distinct terms stay
    * COMFORTABLY under `maxItemsTracked` the sketch returns exact
    * counts (the q_top_terms_approx oracle relies on this — the
    * synthetic vocabulary is far under the bound). The precise
    * exactness boundary is implementation-defined: the DataSketches
    * ItemsSketch guarantees exactness only up to ~0.75× its internal
    * map size, and Spark's maxItemsTracked→map-size mapping is not
    * contractual — do not lean on the region near capacity. Beyond
    * it, counts are estimates with the standard frequent-items error
    * bound (≤ n/maxItemsTracked over-count).
    *
    * The sketch is asked for every tracked item, and the top-k cut is
    * applied OUTSIDE with a deterministic (count desc, term asc)
    * order — the sketch's own k-boundary tie-breaking is
    * implementation-defined, which an oracle-hashed surface cannot
    * tolerate.
    */
  def topTermsApprox(df: DataFrame, textCol: String, k: Int,
      maxItemsTracked: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxItemsTracked >= k,
      s"maxItemsTracked ($maxItemsTracked) must be >= k ($k)")
    val terms = df.select(explode(
      graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
    terms
      .agg(expr(s"approx_top_k(term, $maxItemsTracked, " +
        s"$maxItemsTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("term"),
        col("e.count").as("term_count"))
      .orderBy(col("term_count").desc, col("term").asc)
      .limit(k)
  }
}
