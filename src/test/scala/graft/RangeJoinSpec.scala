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
}
