package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators: cohort retention and ordered
  * funnels. (The reference has no event surface; these are the
  * standard large-scale product/ops queries a curation cluster also
  * serves, shaped for Spark's execution model.)
  */
object EventOps {

  private val PeriodDays = Map("day" -> 1, "week" -> 7)

  /** Cohort retention matrix: users are cohorted by the `period`
    * ("day"/"week"/"month") truncation of their FIRST event; cell
    * (cohort, offset) counts the distinct cohort users active `offset`
    * periods later. Output: (`cohort` timestamp, `offset` long,
    * `n_users` long) — offset 0 is the cohort itself, so each cohort's
    * offset-0 row is its size. Day/week offsets are day-count
    * quotients; month offsets are calendar month differences (both
    * sides are month-truncated, so the difference is exact).
    *
    * Shuffle profile, in decreasing row count: (1) distinct over
    * (user, period) — map-side partial, collapses the event stream to
    * user-period scale BEFORE anything wider; (2) one exchange on user
    * for a HASH aggregate that takes the first-seen min and carries
    * the user's period list along (then re-explodes it) — a plain
    * `min().over(partitionBy(u))` window computes the same thing but
    * WindowExec must SORT every partition by user first, a sort the
    * aggregate provably doesn't need; (3) the final (cohort, offset)
    * aggregation with partial count-distinct. Events themselves are
    * touched exactly once. The carried list holds one entry per
    * DISTINCT period the user was active — bounded by the calendar
    * (a decade of daily activity is ~3.7k entries), not by event
    * volume.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      period: String = "week"): DataFrame = {
    require(period == "month" || PeriodDays.contains(period),
      s"period must be one of day/week/month, got $period")
    val active = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        date_trunc(period, col(tsCol)).as("p"))
      .distinct()
    val offsetExpr =
      if (period == "month")
        ((year(col("p")) - year(col("cohort"))) * 12 +
          (month(col("p")) - month(col("cohort")))).cast("long")
      else
        (datediff(col("p"), col("cohort")) / PeriodDays(period))
          .cast("long")
    active
      .groupBy(col("u"))
      .agg(min(col("p")).as("cohort"), collect_list(col("p")).as("__ps"))
      .select(col("u"), col("cohort"), explode(col("__ps")).as("p"))
      .groupBy(col("cohort"), offsetExpr.as("offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }

  /** Forward-fill (last observation carried forward): each null in
    * `fillCols` takes the most recent non-null value within its key
    * partition, ordered by `orderCols` — the gap-repair step before
    * feature extraction over irregular event streams. All columns
    * share ONE window spec, so the plan runs a single partition-sort
    * regardless of how many columns fill. Leading nulls (nothing to
    * carry) stay null.
    */
  def forwardFill(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], fillCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty && fillCols.nonEmpty,
      "forwardFill needs keys, ordering and fill columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Ordered funnel: how many users completed steps 0..i IN ORDER
    * (each step strictly after the previous one's earliest valid
    * time — the standard "minimal completion time" greedy, which is
    * optimal: taking the earliest valid time for each step can only
    * admit more completions later). Returns one row per step:
    * (`step_idx`, `step`, `n_users`).
    *
    * Single-shuffle shape: ONE groupBy(user) collects each user's
    * per-step event times as sorted arrays (array size bounded by that
    * user's event count — cap upstream for pathological users), the
    * greedy fold over those arrays is a pure per-row expression, and
    * the per-step counts come from one global aggregation. No joins,
    * no per-step passes: events are read once regardless of funnel
    * depth.
    *
    * `tsCol` may be any orderable type; pass epoch micros for
    * engine-portable comparisons.
    *
    * `maxStepGap > 0` adds a per-step conversion DEADLINE: step i
    * must land within `maxStepGap` (same units as `tsCol`) of the
    * step i−1 match. Note the greedy's optimality claim below holds
    * only for the unbounded funnel — with a deadline, first-touch
    * greedy is the deliberate semantics (the industry rule), not the
    * maximum-completion assignment.
    *
    * `maxEventsPerUser` bounds each user's per-step array to that
    * step's EARLIEST `maxEventsPerUser` times, applied inside the
    * aggregation — a bot user with 10M events then holds `steps × cap`
    * entries instead of 10M and cannot OOM an executor. The greedy
    * takes earliest valid times, so a cap only changes the answer for
    * a user whose completion needs an event beyond their step's
    * cap-earliest (deep alternation) — the 10,000 default is orders of
    * magnitude above any real funnel depth. Pass 0 to opt OUT of the
    * bound (unlimited `collect_list` — only safe when upstream already
    * bounds per-user event counts).
    */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String,
      tsCol: String, typeCol: String = "event_type",
      maxEventsPerUser: Int = 10000,
      maxStepGap: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      val sorted = sort_array(collect_list(
        when(col(typeCol) === s, col(tsCol))))
      val capped = if (maxEventsPerUser > 0)
        slice(sorted, 1, maxEventsPerUser) else sorted
      capped.as(s"__a$i")
    }
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(aggs.head, aggs.tail: _*)
    // greedy completion times: t0 = min(a0); t_i = min{x in a_i,
    // x > t_(i-1)}, bounded by t_(i-1) + maxStepGap when a gap is set
    // (first-touch conversion-window semantics: a user failing the
    // deadline on the greedy path does not convert, even if a later
    // attempt chain would have — the industry-standard funnel rule)
    val times = steps.indices.foldLeft(Vector.empty[Column]) { (acc, i) =>
      val t =
        if (i == 0) array_min(col("__a0"))
        else {
          val prev = acc.last
          val inWindow: Column => Column =
            if (maxStepGap > 0L)
              x => x > prev && x <= prev + lit(maxStepGap)
            else x => x > prev
          array_min(filter(col(s"__a$i"), inWindow))
        }
      acc :+ t
    }
    val flags = perUser.select(times.zipWithIndex.map { case (t, i) =>
      t.isNotNull.cast("long").as(s"__f$i") }: _*)
    val countCols = steps.indices.map(i =>
      sum(col(s"__f$i")).as(s"__n$i"))
    flags.agg(countCols.head, countCols.tail: _*)
      .select(explode(array(steps.indices.map(i =>
        struct(lit(i).as("step_idx"), lit(steps(i)).as("step"),
          coalesce(col(s"__n$i"), lit(0L)).as("n_users"))): _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_users"))
  }
  /** Resample each key's event series onto a fixed-step time grid:
    * one row per (key, tick) from the key's first to last event
    * bucket, carrying the last observation at-or-before each tick
    * forward — the regularization step before windowed features or
    * model-ready sequences over irregular event streams. Tick `t`
    * covers `[t·step, (t+1)·step)`; a bucket's observation is its
    * LAST event's value (ties on the timestamp break by `tieCol`
    * descending — deterministic on any partitioning), and a null
    * observation means "no measurement" (the previous non-null
    * carries, matching [[forwardFill]]).
    *
    * Scale shape: bucket reduction is one keyed aggregation
    * (row_number inside (key, tick) — WindowGroupLimit prunes
    * map-side); the grid explodes from the |keys|-row bounds frame,
    * bounded by `maxTicksPerKey` — a key spanning more ticks than
    * that fails LOUDLY (a silent 3e7-row explode from one stuck
    * device is how resamples kill clusters). Null-key rows are
    * dropped (no grid to pin them to).
    */
  def resample(df: DataFrame, keyCols: Seq[String],
      tsMicrosCol: String, tieCol: String, valueCol: String,
      stepMicros: Long, maxTicksPerKey: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty, "resample needs at least one key column")
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    require(maxTicksPerKey > 0, "maxTicksPerKey must be positive")
    val keys = keyCols.map(col)
    val clean = df.na.drop(keyCols :+ tsMicrosCol)
      .withColumn("__tick", expr(s"$tsMicrosCol DIV $stepMicros"))
    val bucketW = Window
      .partitionBy((keys :+ col("__tick")): _*)
      .orderBy(col(tsMicrosCol).desc, col(tieCol).desc)
    val buckets = clean
      .withColumn("__rn", row_number().over(bucketW))
      .filter(col("__rn") === 1)
      .select((keys :+ col("__tick") :+ col(valueCol).as("__bv")): _*)
    val bounds = clean.groupBy(keys: _*)
      .agg(min("__tick").as("__lo"), max("__tick").as("__hi"))
    val worst = bounds
      .agg(max(col("__hi") - col("__lo") + 1).as("m")).head()
    if (!worst.isNullAt(0))
      require(worst.getLong(0) <= maxTicksPerKey,
        s"resample: a key spans ${worst.getLong(0)} ticks " +
          s"(> maxTicksPerKey=$maxTicksPerKey) — widen stepMicros " +
          "or raise the cap explicitly")
    val grid = bounds.select((keys :+
      explode(sequence(col("__lo"), col("__hi"))).as("__tick")): _*)
    val fillW = Window.partitionBy(keys: _*).orderBy("__tick")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, keyCols :+ "__tick", "left")
      .withColumn(valueCol,
        last(col("__bv"), ignoreNulls = true).over(fillW))
      .drop("__bv")
      .withColumnRenamed("__tick", "tick")
  }

  /** Per-key event-rate spike detection — the ingest-monitoring rule
    * "flag any bucket running hotter than `factorDeci`/10 × the key's
    * own typical bucket": per-(key, time-bucket) counts, each key's
    * exact lower median over its ACTIVE buckets (rank ⌈n/2⌉ of the
    * sorted counts — a key is compared against its own typical active
    * period, so sparse keys aren't drowned by empty hours), and an
    * all-integer flag `n·10 > factorDeci·median` — no doubles
    * anywhere, bit-identical on any engine.
    *
    * Shuffle profile: one (key, bucket) partial-aggregated count
    * collapse of the event stream, then one key-partitioned window
    * over each key's bucket rows — bounded by the calendar (a year of
    * hourly buckets is 8.8k rows/key), not event volume. Returns
    * (`keyCol`, `bucket_start`, `n_events`, `median_n`, `spike`).
    */
  def rateSpikes(events: DataFrame, keyCol: String, tsCol: String,
      bucket: String = "hour", factorDeci: Long = 30L): DataFrame = {
    require(factorDeci > 0, s"factorDeci must be positive: $factorDeci")
    val counts = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol))
        .as("bucket_start"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(keyCol))
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col("n_events"), col("bucket_start"))
    val withMedian = counts
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__cnt", count(lit(1)).over(w))
    val medians = withMedian
      .filter(col("__rn") === expr("(__cnt + 1) DIV 2"))
      .select(col(keyCol), col("n_events").as("median_n"))
    counts.join(medians, Seq(keyCol))
      .select(col(keyCol), col("bucket_start"), col("n_events"),
        col("median_n"),
        (col("n_events") * 10 > lit(factorDeci) * col("median_n"))
          .as("spike"))
  }
}
