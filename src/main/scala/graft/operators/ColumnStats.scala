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
    * accumulation), medians by the [[exactQuantiles]] formula.
    *
    * ONE table scan total, however many columns: values stack into
    * (column_name, v) rows, aggregate to per-column value counts
    * (map-side combined), and every statistic — including the median's
    * running cumulative, windowed PER COLUMN so the sort parallelizes
    * across columns — derives from that materialized counts frame.
    * All-null columns are absent from the output (no order statistics
    * exist).
    */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describeNumeric needs at least one column")
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ") +
      ") AS (column_name, v)"
    val counts = df.select(expr(stackExpr))
      .groupBy("column_name", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val nulls = counts.filter(col("v").isNull)
      .select(col("column_name"), col("c").as("__nnull"))
    val base = counts.filter(col("v").isNotNull)
      .groupBy("column_name").agg(
        sum("c").as("n_nonnull"),
        min("v").as("min_v"), max("v").as("max_v"),
        (sum(col("v").cast("decimal(28,6)") * col("c")).cast("double")
          / sum("c")).as("mean_v"))
      .join(nulls, Seq("column_name"), "left")
      .withColumn("n_total",
        col("n_nonnull") + coalesce(col("__nnull"), lit(0L)))
    val w = Window.partitionBy("column_name").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.filter(col("v").isNotNull)
      .withColumn("cum", sum("c").over(w))
      .withColumn("lo_rank", col("cum") - col("c"))
    val ranked = base.select(col("column_name"), col("n_nonnull"))
      .withColumn("r",
        lit(0.5) * (col("n_nonnull") - lit(1L)).cast("double"))
      .withColumn("ri_lo", floor(col("r")))
      .withColumn("ri_hi", ceil(col("r")).cast("long"))
    val lo = ranked
      .join(cum.select(col("column_name"), col("v").as("v_lo"),
        col("lo_rank"), col("cum")), Seq("column_name"))
      .filter((col("lo_rank") <= col("ri_lo")) &&
        (col("ri_lo") < col("cum")))
      .select("column_name", "r", "ri_lo", "ri_hi", "v_lo")
    val med = lo
      .join(cum.select(col("column_name"), col("v").as("v_hi"),
        col("lo_rank").as("lr2"), col("cum").as("cum2")),
        Seq("column_name"))
      .filter((col("lr2") <= col("ri_hi")) &&
        (col("ri_hi") < col("cum2")))
      .select(col("column_name"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) *
          (col("r") - col("ri_lo").cast("double"))).as("median_v"))
    base.join(med, Seq("column_name"))
      .select(col("column_name"), col("n_total"), col("n_nonnull"),
        col("min_v"), col("max_v"), col("mean_v"), col("median_v"))
  }
}
