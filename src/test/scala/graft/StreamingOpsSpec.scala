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

  test("forwardFillStream TTL evicts idle keys and restarts them cold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Option[Double])]
    val filled = StreamingOps.forwardFillStream(spark,
      mem.toDF().toDF("user_id", "ts", "value"),
      idleTtlMs = 10 * 60 * 1000)
    val q = filled.writeStream.format("memory").queryName("ffttl_out")
      .outputMode("append").start()
    try {
      // both keys store a value; both hold state
      mem.addData((1L, ts(0), Some(1.0)), (2L, ts(0), Some(2.0)))
      q.processAllAvailable()
      // key 1 stays active far past key 2's TTL; end-of-batch watermark
      // moves to 10:40, beyond key 2's 10:10 timeout
      mem.addData((1L, ts(40), Some(3.0)))
      q.processAllAvailable()
      // next batch processes the expired timeout: key 2's state drops
      mem.addData((1L, ts(41), None))
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal).lastOption
      assert(stateRows.contains(1L),
        s"expected 1 state row after eviction, got $stateRows")
      // key 2 restarts cold: its next null has no memory of 2.0
      mem.addData((2L, ts(42), None))
      q.processAllAvailable()
      val rows = spark.table("ffttl_out")
        .as[(Long, Timestamp, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(rows((1L, ts(41))) == Some(3.0)) // active key unaffected
      assert(rows((2L, ts(42))) == None)      // evicted: cold restart
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

  test("sessionize: ancient stragglers form their own closed session " +
      "instead of stretching the open one backward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingOps.sessionize(spark,
      mem.toDF().toDF("user_id", "ts"), gapMs = 5 * 60 * 1000,
      lateness = "2 hours")
    val q = sessions.writeStream.format("memory")
      .queryName("anc_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(30)), (1L, ts(31))) // open session 10:30-10:31
      q.processAllAvailable()
      // two stragglers > gapMs before the session start, within gap of
      // each other: ONE closed session (10:08, 10:10, 2), open session
      // untouched
      mem.addData((1L, ts(8)), (1L, ts(10)))
      q.processAllAvailable()
      val early = spark.table("anc_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
      assert(early.toSeq == Seq((1L, ts(8), ts(10), 2L)))
      // watermark advance flushes the open session with its ORIGINAL
      // start — not one stretched back to 10:08
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:30:00")))
      q.processAllAvailable()
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:31:00")))
      q.processAllAvailable()
      val all = spark.table("anc_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 == 1L).toSet
      assert(all == Set((1L, ts(8), ts(10), 2L),
        (1L, ts(30), ts(31), 2L)))
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

  test("decontaminateIngest drops contaminated docs at ingest, " +
      "identical to the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((1L, "what is the capital city of france exactly"))
      .toDF("q", "t")
    val rows = Seq(
      (10L, "discussion about the capital city of france and what " +
        "is the capital city of france exactly you may wonder"),
      (11L, "a completely clean document about cooking pasta well"),
      (12L, "another clean one mentioning nothing relevant at all"))
    val mem = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.decontaminateIngest(spark,
        mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
        "t", n = 5) { (df, _) =>
      kept ++= df.select("doc_id").as[Long].collect()
    }
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val batchKept = graft.operators.Decontaminate
        .removeContaminatedBloom(rows.toDF("doc_id", "text"),
          "doc_id", "text", bench, "t", n = 5)
        .select("doc_id").as[Long].collect().toSet
      assert(kept.toSet == batchKept)
      assert(kept.toSet == Set(11L, 12L))
    } finally q.stop()
  }

  test("commitTail folds a live commit stream into per-table " +
      "snapshots with O(1) state (round 18)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, Long)]
    val out = StreamingOps.commitTail(spark,
      mem.toDF().toDF("table", "version", "kind", "size"))
    val q = out.writeStream.format("memory").queryName("tail_out")
      .outputMode("update").start()
    try {
      // batch 1: t1 adds two files, t2 adds one
      mem.addData(("t1", 0L, "add", 100L), ("t1", 0L, "add", 50L),
        ("t1", 0L, "commitInfo", 0L), ("t2", 0L, "add", 7L))
      q.processAllAvailable()
      val b1 = spark.table("tail_out")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(b1 == Set(("t1", 0L, 2L, 150L), ("t2", 0L, 1L, 7L)))
      // batch 2: t1 removes one of them and adds another; t2 idle
      mem.addData(("t1", 1L, "remove", 50L),
        ("t1", 1L, "add", 30L))
      q.processAllAvailable()
      val b2 = spark.table("tail_out")
        .as[(String, Long, Long, Long)].collect().toSet
      // update mode: t1's NEW snapshot appears; t2 not re-emitted
      assert(b2.contains(("t1", 1L, 2L, 130L)))
      assert(!b2.contains(("t2", 1L, 1L, 7L)))
    } finally q.stop()
  }
}
