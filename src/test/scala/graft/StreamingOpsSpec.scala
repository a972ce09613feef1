package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("windowedEventStats: hour windows equal date_trunc semantics") {
    val df = Seq(
      (ts(5), "click", 1.0), (ts(59), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:01:00"), "click", 3.0),
      (ts(10), "view", 1.0)).toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedEventStats(df, "1 hour")
      .select("win_start", "event_type", "n_events")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(out == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "click", 1L),
      (Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L)))
  }

  test("finalizeSessions splits on gaps > gapMs") {
    val df = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)),   // session 1
      (1L, ts(30)), (1L, ts(31)),              // session 2 (28-min gap)
      (2L, ts(0))                              // other user
    ).toDF("user_id", "ts")
    val out = StreamingOps.finalizeSessions(spark, df, gapMs = 5 * 60 * 1000)
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("withLateDataBound installs an event-time watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = StreamingOps.withLateDataBound(
      mem.toDF().toDF("ts", "event_type", "value"), "10 minutes")
    assert(df.queryExecution.analyzed.toString
      .contains("EventTimeWatermark"))
  }

  test("windowedEventStats runs as a real stream with watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 12:30:00"), "click", 3.0))
    val agg = StreamingOps.windowedEventStats(
      StreamingOps.withLateDataBound(
        mem.toDF().toDF("ts", "event_type", "value"), "10 minutes"),
      "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the watermark computed at the end of batch 0 (12:30 − 10 min)
      // finalizes the 10:00 window; append emits it on the NEXT batch
      mem.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "view", 1.0))
      q.processAllAvailable()
      val done = spark.table("win_out")
        .select("win_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect()
      assert(done.contains(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L)))
    } finally q.stop()
  }

  test("curation functions run unchanged on a stream (stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.{TextFunctions => T}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "zz zz zz zz zz zz"),
      (3L, "mail me at someone@example.com for the full details now ok"))
    val out = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        T.qualityKeep(col("text")).as("keep"),
        T.redactPii(col("text")).as("clean"))
    val q = out.writeStream.format("memory").queryName("cur_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cur_out")
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(true, false, true))
    assert(rows(2)._3 ==
      "mail me at <EMAIL> for the full details now ok")
  }

  test("dedupStream suppresses duplicate keys across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingOps.dedupStream(
      mem.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      mem.addData((ts(3), "a"), (ts(4), "c")) // 'a' still within delay
      q.processAllAvailable()
      val keys = spark.table("dedup_out").select("k")
        .as[String].collect().sorted
      assert(keys.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("forwardFillStream carries last non-null across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Option[Double])]
    val filled = StreamingOps.forwardFillStream(spark,
      mem.toDF().toDF("user_id", "ts", "value"))
    val q = filled.writeStream.format("memory").queryName("ff_out")
      .outputMode("append").start()
    try {
      // batch 0: null before any value stays null; fill within batch
      mem.addData((1L, ts(0), None), (1L, ts(1), Some(5.0)),
        (1L, ts(2), None))
      q.processAllAvailable()
      // batch 1: state carries 5.0 across the batch boundary; user 2
      // has its own state
      mem.addData((1L, ts(3), None), (2L, ts(3), None),
        (1L, ts(4), Some(7.0)), (1L, ts(5), None))
      q.processAllAvailable()
      val rows = spark.table("ff_out")
        .as[(Long, Timestamp, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(rows((1L, ts(0))) == None)
      assert(rows((1L, ts(2))) == Some(5.0))
      assert(rows((1L, ts(3))) == Some(5.0)) // across batches
      assert(rows((1L, ts(5))) == Some(7.0))
      assert(rows((2L, ts(3))) == None)      // keys are isolated
    } finally q.stop()
  }

  test("sessionize (stateful streaming op) agrees with batch finalize") {
    // Drive the actual flatMapGroupsWithState op through a memory
    // stream — the same op a production readStream would run.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((1L, ts(0)), (1L, ts(1)), (1L, ts(30)))
    val sessions = StreamingOps.sessionize(spark,
      mem.toDF().toDF("user_id", "ts"), gapMs = 5 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the first session (2 events) closes when the 10:30 event arrives
      val done = spark.table("sess_out")
        .select("user_id", "n_events").as[(Long, Long)].collect()
      assert(done.toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("sessionize: admitted out-of-order event does not shrink session end") {
    // lateness 10 min admits a cross-batch straggler EARLIER than the
    // session's current end; the session end must stay at the max event
    // time (a shrunken `last` would register a too-early timeout and
    // flush the session prematurely with a wrong end timestamp)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingOps.sessionize(spark,
      mem.toDF().toDF("user_id", "ts"), gapMs = 5 * 60 * 1000,
      lateness = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("ooo_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(10)), (1L, ts(12)))
      q.processAllAvailable()
      // straggler: 10:08 < session last 10:12, > watermark 10:02 — admitted
      mem.addData((1L, ts(8)))
      q.processAllAvailable()
      // other-user traffic advances the watermark past 10:12 + gap
      mem.addData((2L, ts(45)))
      q.processAllAvailable()
      mem.addData((2L, ts(46)))
      q.processAllAvailable()
      val flushed = spark.table("ooo_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 == 1L)
      assert(flushed.toSeq == Seq((1L, ts(8), ts(12), 3L)))
    } finally q.stop()
  }

  test("sessionize flushes an idle user's session via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingOps.sessionize(spark,
      mem.toDF().toDF("user_id", "ts"), gapMs = 5 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("idle_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(1))) // user 1 then goes idle
      q.processAllAvailable()
      assert(spark.table("idle_out").isEmpty) // session still open
      // OTHER users' traffic advances the watermark past 10:01 + gap;
      // user 1 never sends a successor event
      mem.addData((2L, ts(40)))
      q.processAllAvailable()
      mem.addData((2L, ts(41)))
      q.processAllAvailable()
      val flushed = spark.table("idle_out")
        .select("user_id", "n_events").as[(Long, Long)].collect()
      assert(flushed.contains((1L, 2L)))
    } finally q.stop()
  }
}
