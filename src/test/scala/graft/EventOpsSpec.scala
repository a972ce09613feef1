package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("cohortRetention: first-seen cohorts, offsets, distinct users") {
    // weeks: Jan 1 (Mon) and Jan 8. u1 active both weeks, u2 week 1
    // only, u3 first seen week 2
    val ev = Seq(
      (1L, ts(2)), (1L, ts(3)), (1L, ts(10)),
      (2L, ts(4)),
      (3L, ts(9)), (3L, ts(11))
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(ev, "user_id", "ts", "week")
      .as[(Timestamp, Long, Long)].collect().toSet
    val w1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = Timestamp.valueOf("2024-01-08 00:00:00")
    assert(out == Set((w1, 0L, 2L), (w1, 1L, 1L), (w2, 0L, 1L)))
  }

  test("cohortRetention day period and null filtering") {
    val ev = Seq(
      (Some(1L), Some(ts(1))), (Some(1L), Some(ts(3))),
      (None, Some(ts(1))), (Some(2L), None)
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(ev, "user_id", "ts", "day")
      .as[(Timestamp, Long, Long)].collect().toSet
    val d1 = Timestamp.valueOf("2024-01-01 00:00:00")
    assert(out == Set((d1, 0L, 1L), (d1, 2L, 1L)))
    intercept[IllegalArgumentException] {
      EventOps.cohortRetention(ev, "user_id", "ts", "fortnight")
    }
  }

  test("cohortRetention plan: hash-agg first-seen, no window, no sort") {
    val ev = Seq((1L, ts(2))).toDF("user_id", "ts")
    val plan = EventOps.cohortRetention(ev, "user_id", "ts", "week")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Sort"), s"sort in plan:\n$plan")
  }

  test("cohortRetention month period uses calendar month offsets") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-15 10:00:00")),
      (1L, Timestamp.valueOf("2024-03-02 10:00:00")), // +2 months
      (2L, Timestamp.valueOf("2024-02-28 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(ev, "user_id", "ts", "month")
      .as[(Timestamp, Long, Long)].collect().toSet
    val jan = Timestamp.valueOf("2024-01-01 00:00:00")
    val feb = Timestamp.valueOf("2024-02-01 00:00:00")
    assert(out == Set((jan, 0L, 1L), (jan, 2L, 1L), (feb, 0L, 1L)))
  }

  test("forwardFill carries last non-null per key; leading nulls stay") {
    val df = Seq(
      (1L, 1L, None),         (1L, 2L, Some(10.0)),
      (1L, 3L, None),         (1L, 4L, None),
      (1L, 5L, Some(20.0)),
      (2L, 1L, None)          // other key: never sees user 1's values
    ).toDF("u", "seq", "v")
    val out = EventOps.forwardFill(df, Seq("u"), Seq("seq"), Seq("v"))
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 1L)) == None)       // leading null stays
    assert(out((1L, 3L)) == Some(10.0))
    assert(out((1L, 4L)) == Some(10.0))
    assert(out((1L, 5L)) == Some(20.0)) // real values untouched
    assert(out((2L, 1L)) == None)
  }

  test("funnel: order matters and greedy picks earliest valid times") {
    val ev = Seq(
      // u1 completes A->B->C in order
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // u2 has all three but C BEFORE B: stops after B
      (2L, "A", 10L), (2L, "C", 15L), (2L, "B", 20L),
      // u3: B before any A — only A counts (via its later A)
      (3L, "B", 5L), (3L, "A", 8L),
      // u4: greedy must take the SECOND A (after noise) -- first A at 1,
      // B at 2 works; then C at 3: completes
      (4L, "A", 1L), (4L, "B", 2L), (4L, "C", 3L),
      // u5: only B -- counts for nothing
      (5L, "B", 9L)
    ).toDF("user_id", "event_type", "tsu")
    val out = EventOps.funnel(ev, Seq("A", "B", "C"), "user_id", "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "A", 4L), (1, "B", 3L), (2, "C", 2L)))
  }

  test("funnel with maxStepGap: deadline is inclusive, first-touch " +
      "greedy does not retry from a later start") {
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 15L),   // within gap 5 (inclusive)
      (2L, "A", 10L), (2L, "B", 16L),   // misses gap 5 by 1
      // u3: B at 14 converts from the FIRST A (10); a second A at 20
      // exists but greedy never restarts from it
      (3L, "A", 10L), (3L, "B", 14L), (3L, "A", 20L),
      // u4: only a late B — the first-touch A at 10 can't reach it,
      // even though A at 30 would (first-touch semantics)
      (4L, "A", 10L), (4L, "A", 30L), (4L, "B", 33L)
    ).toDF("user_id", "event_type", "tsu")
    val out = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu",
        maxStepGap = 5L)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "A", 4L), (1, "B", 2L)))
    // gap 0 = unbounded: u2 and u4 convert too
    val unbounded = EventOps.funnel(ev, Seq("A", "B"), "user_id",
        "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(unbounded == Seq((0, "A", 4L), (1, "B", 4L)))
  }

  test("funnel: strictly-after semantics (ties do not advance)") {
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 10L), // tie: B not after A
      (2L, "A", 10L), (2L, "B", 11L)
    ).toDF("user_id", "event_type", "tsu")
    val out = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "A", 2L), (1, "B", 1L)))
  }

  test("funnel on an empty frame returns zero counts") {
    val ev = Seq.empty[(Long, String, Long)]
      .toDF("user_id", "event_type", "tsu")
    val out = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "A", 0L), (1, "B", 0L)))
  }

  test("funnel: maxEventsPerUser bounds a pathological user's arrays " +
      "without changing sane answers") {
    val bot = (1 to 5000).map(i => (9L, "A", i.toLong)) ++
      Seq((9L, "B", 6000L)) ++
      Seq((1L, "A", 10L), (1L, "B", 20L))
    val ev = bot.toDF("user_id", "event_type", "tsu")
    val unlimited = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    // cap 100: bot keeps its 100 earliest A times — earliest-valid
    // greedy only ever needed the first one, so counts are unchanged
    val capped = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu",
      maxEventsPerUser = 100)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(capped == unlimited)
    assert(capped == Seq((0, "A", 2L), (1, "B", 2L)))
    // the documented trade: a completion whose qualifying event lies
    // beyond the step's cap-earliest times is missed (B must be after
    // A at 5; the only such B, at 10, is B's 3rd-earliest but cap = 2)
    val deep = Seq((1L, "A", 5L), (1L, "B", 1L), (1L, "B", 2L),
      (1L, "B", 10L)).toDF("user_id", "event_type", "tsu")
    def run(cap: Int) = EventOps.funnel(deep, Seq("A", "B"), "user_id",
      "tsu", maxEventsPerUser = cap)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(0) == Seq((0, "A", 1L), (1, "B", 1L)))
    assert(run(2) == Seq((0, "A", 1L), (1, "B", 0L)))
  }

  test("funnel: the DEFAULT cap is finite (bot arrays bounded) and a " +
      "beyond-cap bot still doesn't change a shallow funnel's counts") {
    // default plan slices each per-step array; opting out (0) doesn't
    val ev = Seq((1L, "A", 1L)).toDF("user_id", "event_type", "tsu")
    val defPlan = EventOps.funnel(ev, Seq("A"), "user_id", "tsu")
      .queryExecution.analyzed.toString
    val unboundedPlan = EventOps.funnel(ev, Seq("A"), "user_id", "tsu",
      maxEventsPerUser = 0).queryExecution.analyzed.toString
    assert(defPlan.contains("slice"), s"default cap not applied:\n$defPlan")
    assert(!unboundedPlan.contains("slice"))
    // a bot holding 11k A-events (beyond the 10k default cap) still
    // completes A->B: the greedy only ever needs the earliest valid time
    val bot = (1 to 11000).map(i => (9L, "A", i.toLong)) ++
      Seq((9L, "B", 20000L), (1L, "A", 10L), (1L, "B", 20L))
    val out = EventOps.funnel(bot.toDF("user_id", "event_type", "tsu"),
      Seq("A", "B"), "user_id", "tsu")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "A", 2L), (1, "B", 2L)))
  }

  test("funnel reads events once: single shuffle, no joins") {
    val ev = Seq((1L, "A", 1L)).toDF("user_id", "event_type", "tsu")
    val plan = EventOps.funnel(ev, Seq("A", "B"), "user_id", "tsu")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("resample fills gaps, breaks bucket ties by tieCol, treats " +
      "null values as no-measurement") {
    // step 10: user 1 events at t=5 (v=1), t=12&15 same bucket
    // (later id wins), t=47 null value, nothing in ticks 2-3
    val ev = Seq(
      (1L, 5L, 1L, Some(1.0)),
      (2L, 15L, 1L, Some(2.0)),
      (3L, 15L, 1L, Some(3.0)),   // same ts: higher id wins
      (4L, 47L, 1L, None: Option[Double]),
      (5L, 8L, 2L, Some(9.0))
    ).toDF("event_id", "tsu", "user_id", "value")
    val got = EventOps.resample(ev, Seq("user_id"), "tsu",
        "event_id", "value", stepMicros = 10L)
      .select("user_id", "tick", "value").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 0L)) == Some(1.0))
    assert(got((1L, 1L)) == Some(3.0)) // tie at ts 15 -> event_id 3
    assert(got((1L, 2L)) == Some(3.0)) // gap carries
    assert(got((1L, 3L)) == Some(3.0))
    assert(got((1L, 4L)) == Some(3.0)) // null measurement: carry
    assert(got((2L, 0L)) == Some(9.0))
    assert(got.size == 6) // user 2: single tick
  }

  test("resample fails loudly past maxTicksPerKey") {
    val ev = Seq((1L, 0L, 1L, 1.0), (2L, 1000L, 1L, 2.0))
      .toDF("event_id", "tsu", "user_id", "value")
    val e = intercept[IllegalArgumentException] {
      EventOps.resample(ev, Seq("user_id"), "tsu", "event_id",
        "value", stepMicros = 1L, maxTicksPerKey = 100L)
    }
    assert(e.getMessage.contains("maxTicksPerKey"))
  }

  test("rateSpikes: per-key lower median over ACTIVE buckets, " +
      "integer threshold flag") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:01")
    // user 1: hours with counts 1,1,4 → median 1; 4 > 3×1 spikes
    // user 2: counts 2,2 → median 2; nothing exceeds 3×2
    val rows =
      Seq.fill(1)(1L -> ts(1, 0)) ++ Seq.fill(1)(1L -> ts(1, 5)) ++
      Seq.fill(4)(1L -> ts(2, 7)) ++
      Seq.fill(2)(2L -> ts(1, 0)) ++ Seq.fill(2)(2L -> ts(3, 9))
    val ev = rows.toDF("user_id", "ts")
    val out = EventOps.rateSpikes(ev, "user_id", "ts", "hour",
        factorDeci = 30L)
      .as[(Long, Timestamp, Long, Long, Boolean)].collect()
    val byKey = out.groupBy(_._1)
    assert(byKey(1L).map(_._4).toSet == Set(1L)) // median 1
    assert(byKey(2L).map(_._4).toSet == Set(2L)) // median 2
    assert(out.filter(_._5).map(r => (r._1, r._3)).toSeq ==
      Seq((1L, 4L)))
  }

  test("rateSpikes: even bucket counts take the LOWER median; " +
      "factor boundary is strict >") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:01")
    // user 1 daily counts sorted: 1,3 → lower median (rank ⌈2/2⌉=1)
    // is 1; with factorDeci=30, 3 > 3×1 is FALSE (strict >)
    val rows = Seq.fill(1)(1L -> ts(1)) ++ Seq.fill(3)(1L -> ts(2))
    val out = EventOps.rateSpikes(rows.toDF("user_id", "ts"),
        "user_id", "ts", "day", factorDeci = 30L)
      .as[(Long, Timestamp, Long, Long, Boolean)].collect()
    assert(out.forall(_._4 == 1L))
    assert(out.forall(!_._5))
  }
}
