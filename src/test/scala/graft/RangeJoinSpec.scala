package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive cross-join reference on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 100))
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextDouble() * 100
      (i.toLong, lo, lo + rnd.nextDouble() * 10)
    }
    val pdf = pts.toDF("pid", "x")
    val idf = ivs.toDF("iid", "lo", "hi")
    for (w <- Seq(0.5, 5.0, 200.0)) {
      val got = RangeJoin
        .pointInInterval(pdf, idf, "x", "lo", "hi", chunkWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, x) <- pts; (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)).toSet
      assert(got == want, s"chunkWidth=$w")
    }
  }

  test("closed bounds, chunk boundaries, empty and null intervals") {
    val pdf = Seq((1L, 10.0), (2L, 20.0), (3L, 10.5)).toDF("pid", "x")
    val idf = Seq(
      (1L, Some(10.0), Some(20.0)),  // closed: both endpoints match
      (2L, Some(30.0), Some(20.0)),  // inverted: never matches
      (3L, None, Some(50.0))         // null bound: never matches
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(pdf, idf, "x", "lo", "hi", chunkWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("equi-keys restrict matches and join alongside the chunk") {
    val pdf = Seq(("a", 5.0), ("b", 5.0)).toDF("k", "x")
    val idf = Seq(("a", 0.0, 10.0)).toDF("k", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(pdf, idf, "x", "lo", "hi", 10.0, keys = Seq("k"))
      .select("k").as[String].collect().toSeq
    assert(got == Seq("a"))
  }

  test("plans as an equi-join on the chunk, not a nested-loop join") {
    val pdf = (1 to 100).map(i => (i.toLong, i / 7.0)).toDF("pid", "x")
    val idf = (1 to 50).map(i => (i.toLong, i / 4.0, i / 4.0 + 1))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin
      .pointInInterval(pdf, idf, "x", "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"nested-loop shape in:\n$plan")
  }

  test("intervalOverlap: closed-bound overlap incl. touching " +
      "endpoints; multi-chunk pairs emitted exactly once") {
    val a = Seq(
      (1L, 0.0, 10.0),   // spans many 1.0-chunks
      (2L, 20.0, 21.0),
      (3L, 30.0, 30.0)   // degenerate point-interval
    ).toDF("a_key", "a_lo", "a_hi")
    val b = Seq(
      (10L, 4.0, 6.0),   // inside 1 -> one pair despite 3 shared chunks
      (11L, 10.0, 12.0), // touches 1's hi endpoint -> overlap (closed)
      (12L, 21.0, 25.0), // touches 2
      (13L, 30.0, 31.0), // contains 3's point
      (14L, 50.0, 60.0)  // overlaps nothing
    ).toDF("b_key", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", chunkWidth = 1.0)
      .select("a_key", "b_key").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (2L, 12L),
      (3L, 13L)))
  }

  test("intervalOverlap equals the brute-force predicate on dense " +
      "data and drops null/empty intervals") {
    val a = (0L until 60L).map(i =>
      (i, i * 0.7, i * 0.7 + 2.0)).toDF("a_key", "a_lo", "a_hi")
    val b = (0L until 60L).map(i =>
      (i, i * 1.1, i * 1.1 + 1.5)).toDF("b_key", "b_lo", "b_hi")
    val fast = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", chunkWidth = 2.0)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    assert(fast == brute && fast.nonEmpty)
    // null and inverted bounds never match
    val bad = Seq((9L, null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(5.0)),
      (8L, java.lang.Double.valueOf(7.0),
        java.lang.Double.valueOf(3.0)))
      .toDF("a_key", "a_lo", "a_hi")
    assert(RangeJoin.intervalOverlap(bad, b, "a_lo", "a_hi",
      "b_lo", "b_hi", 2.0).count() == 0L)
  }
}
