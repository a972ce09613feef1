package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators. The reference has no streaming
  * surface (SURVEY.md §2.10); these are the beyond-parity stream
  * transforms a continuous ingestion pipeline needs, built so the SAME
  * transform serves batch and streaming frames (Structured Streaming's
  * unified Dataset API).
  */
object StreamingOps {

  /** Tumbling-window event aggregation. On a streaming frame add a
    * watermark first ([[withLateDataBound]]); on a batch frame it is the
    * windowed groupBy alone. Window starts are epoch-aligned, so a
    * 1-hour window start equals `date_trunc('hour', ts)` — the oracle
    * equivalence used in SparkEntry.
    */
  def windowedEventStats(df: DataFrame, windowLen: String): DataFrame =
    df.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  def withLateDataBound(df: DataFrame, delay: String): DataFrame =
    df.withWatermark("ts", delay)

  /** Streaming exact/near-exact dedup: drop rows whose key columns were
    * already seen, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — duplicates arriving within the
    * delay are suppressed, state for keys older than the watermark is
    * evicted, so state size is bounded by the key arrival rate × delay
    * window instead of growing forever). Key by
    * [[graft.functions.TextFunctions.fingerprint]] of the text column
    * for streaming near-exact document dedup.
    */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization with explicit state —
    * `flatMapGroupsWithState` keyed by user, emitting a session when
    * `gapMs` of silence passes (reference has nothing comparable; this
    * is the canonical custom-state streaming op).
    *
    * Memory bound: each invocation sorts ONE user's events from the
    * CURRENT micro-batch (not all history — state carries only the
    * open session's 3 counters). Per-user-per-batch volume is the
    * bound; a pathological single-user firehose should be pre-bucketed
    * by (user, coarse time) upstream.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long)
      : Dataset[SessionOut] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"),
        col("ts").cast("timestamp").as("ts"))
      .as[(Long, Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Timestamp)],
            state: GroupState[SessionState]) => {
          val times = rows.map(_._2.getTime).toSeq.sorted
          var st = state.getOption
          val out = Seq.newBuilder[SessionOut]
          times.foreach { t =>
            st match {
              case Some(s) if t - s.last <= gapMs =>
                st = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out += SessionOut(user, new Timestamp(s.start),
                  new Timestamp(s.last), s.n)
                st = Some(SessionState(t, t, 1))
              case None =>
                st = Some(SessionState(t, t, 1))
            }
          }
          st.foreach(state.update)
          out.result().iterator
        })
  }

  /** Drain any pending session state (batch-mode finalize). */
  def finalizeSessions(spark: SparkSession, events: DataFrame,
      gapMs: Long): DataFrame = {
    import spark.implicits._
    // Batch equivalent of the stateful op: window-lag gap detection.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (col("ts").cast("long") - col("prev_ts").cast("long")) * 1000
            > gapMs).cast("int"))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
