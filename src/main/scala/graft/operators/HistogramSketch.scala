package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable bucketed-histogram quantile sketch — the incremental
  * answer to "p99 latency / doc length per source, updated daily".
  * The exact-quantile surfaces (SURVEY C18/C47/C76…) re-scan the
  * corpus per question; this sketch is computed ONCE per
  * day/source/partition in one map-side-combined pass, stored as a
  * few-hundred-row table, and any union of days is answered later by
  * adding counts — merge is associative and commutative, so
  * increments compose in any order, and (unlike KLL/t-digest, whose
  * compactions are merge-ORDER-dependent) the result is bit-identical
  * however the work was partitioned. The trade: a fixed additive
  * value-error bound of `bucketWidth` on the estimate, chosen up
  * front on the integer micro-grid the repo quantizes on anyway.
  *
  * Sketch representation is a tall DataFrame (keys…, bucket, cnt) —
  * deliberately NOT an opaque binary: it partition-prunes, merges
  * with groupBy-sum, and replays in any SQL engine.
  *
  * 100 TB shape: `fit` is one aggregation whose shuffle carries one
  * row per (key, bucket) — bounded by value-range/width per key, not
  * by data size; `quantileEstimate` windows per key over that bounded
  * bucket list (shuffle on key, map-side-combined totals).
  */
object HistogramSketch {

  /** One histogram per key set: (keys…, bucket, cnt) with
    * bucket = valueMicro DIV bucketWidth (floor toward −∞ for the
    * all-positive grids used here; nulls drop). `valueMicroCol` must
    * already be an integer-grid column (the repo's quantization
    * discipline — e.g. `CAST(round(price·100) AS BIGINT)`).
    */
  def fit(df: DataFrame, valueMicroCol: String, keys: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    df.filter(col(valueMicroCol).isNotNull)
      .groupBy((keys.map(col) :+
        expr(s"$valueMicroCol DIV $bucketWidth").as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge any number of sketch frames (e.g. daily increments) built
    * with the SAME keys and bucketWidth: pure count addition.
    */
  def merge(sketches: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Quantile estimates from a sketch: for each key and each
    * requested pMicro (fraction in micro-units, e.g. 990000 = p99),
    * the smallest bucket whose cumulative count reaches
    * rank = ceil(pMicro·N / 10⁶), reported as the bucket's lower
    * bound `est_micro = bucket · bucketWidth` — within bucketWidth
    * below the exact quantile value's bucket floor. All integer
    * arithmetic; deterministic for any partitioning.
    */
  def quantileEstimate(sketch: DataFrame, keys: Seq[String],
      bucketWidth: Long, psMicro: Seq[Long]): DataFrame = {
    require(psMicro.nonEmpty && psMicro.forall(p => p > 0 &&
      p <= 1000000L), "pMicro must be in (0, 1000000]")
    val w = Window.partitionBy(keys.map(col): _*).orderBy("bucket")
    val cum = sketch
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(
        Window.partitionBy(keys.map(col): _*)))
    cum.withColumn("p_micro",
        explode(array(psMicro.map(lit): _*)))
      .filter(col("__cum") >=
        expr("(p_micro * __n + 999999) DIV 1000000"))
      .groupBy((keys.map(col) :+ col("p_micro")): _*)
      .agg(min("bucket").as("__b"))
      .withColumn("est_micro", col("__b") * bucketWidth)
      .drop("__b")
  }
}
