package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics. Built on the value-count shape:
  * one `groupBy(value).count()` pass (map-side combined — the shuffle
  * carries distinct values, not rows), then a running cumulative over
  * the DISTINCT-VALUE frame. That frame is the scale bound: exact
  * quantiles cost O(distinct values) post-shuffle, which is the right
  * trade for measure-like columns; key-like columns should use
  * `approx_percentile` instead (the classify pass flags which is
  * which).
  */
object ColumnStats {

  /** Exact interpolated quantiles (SQL-standard `quantile_cont`
    * definition: rank = p·(n−1), linear interpolation between the two
    * straddling order statistics). The interpolation is the literal
    * expression v_lo + (v_hi − v_lo)·(r − floor(r)) over exact inputs
    * in a fixed operation order, so any engine replaying the same
    * formula reproduces it bit-for-bit — unlike built-in percentile
    * implementations whose internal arithmetic is unspecified.
    *
    * Returns one row per requested p: (`p`, `quantile`, `n`), nulls
    * excluded (SQL semantics). The rank→value lookups are range joins
    * of the |ps|-row rank frame against the distinct-value frame
    * (broadcast nested loop over the tiny side).
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "quantile points must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"))
    val counts = vals.groupBy("v").agg(count(lit(1)).as("c"))
    // running cumulative over distinct values — the single-partition
    // window runs over the COUNTS frame (|distinct| rows), never rows
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialize ONCE: cum is referenced by both rank joins and the
    // total — without the checkpoint each reference re-evaluates the
    // whole scan + count + single-partition window subtree
    val cum = counts.withColumn("cum", sum("c").over(w))
      .withColumn("lo_rank", col("cum") - col("c"))
      .localCheckpoint()
    val n = cum.agg(sum("c").as("n"))
    // rank r = p*(n-1); straddling order statistics at floor/ceil(r)
    val ranked = ps.toDF("p").crossJoin(broadcast(n))
      .withColumn("r", col("p") * (col("n") - lit(1L)).cast("double"))
      .withColumn("ri_lo", floor(col("r")).cast("long"))
      .withColumn("ri_hi", ceil(col("r")).cast("long"))
    // order statistic k lives in the cum-row with lo_rank <= k < cum
    val lo = ranked.join(cum,
        (col("lo_rank") <= col("ri_lo")) && (col("ri_lo") < col("cum")))
      .select(col("p"), col("n"), col("r"), col("ri_lo"), col("ri_hi"),
        col("v").as("v_lo"))
    val both = lo.join(cum.select(col("v").as("v_hi"),
        col("lo_rank").as("lr2"), col("cum").as("cum2")),
        (col("lr2") <= col("ri_hi")) && (col("ri_hi") < col("cum2")))
    both.select(col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) *
          (col("r") - col("ri_lo").cast("double"))).as("quantile"),
        col("n"))
  }

  /** describe() for measure columns — one tidy row per column with
    * engine-portable arithmetic throughout: counts and min/max are
    * exact, the mean sums in decimal (never an order-dependent double
    * accumulation), the median by the [[exactQuantiles]] formula.
    *
    * Shape: ONE fused aggregation scan computes every column's base
    * stats (column-pruned parquet reads each column once — a
    * stacked/long layout was measured slower: it trades the cheap
    * pruned scans for an all-values shuffle), then one value-count
    * quantile pass per column. The 1-row base frame is pinned so its
    * k projections don't re-run the scan. All-null columns are absent
    * from the output (no order statistics exist).
    */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describeNumeric needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c"),
      (sum(col(c).cast("decimal(28,6)")).cast("double") /
        count(col(c))).as(s"__mean_$c")))
    val base = df
      .agg(count(lit(1)).as("__n_total"), aggs: _*)
      .localCheckpoint()
    cols.map { c =>
      val med = exactQuantiles(df, c, Seq(0.5))
        .select(col("quantile").as("median_v"))
      base.select(lit(c).as("column_name"),
          col("__n_total").as("n_total"),
          col(s"__nn_$c").as("n_nonnull"),
          col(s"__min_$c").as("min_v"),
          col(s"__max_$c").as("max_v"),
          col(s"__mean_$c").as("mean_v"))
        .crossJoin(med)
    }.reduce(_ unionByName _)
  }
}
