package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val clicks = Seq(
    (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L),
    (4L, 200L, 50L), (5L, 300L, 10L)
  ).toDF("click_id", "u", "t")

  private lazy val purchases = Seq(
    (100L, 10L, 1.0), (100L, 20L, 2.0),
    (200L, 50L, 3.0) // exactly at the click time
  ).toDF("u", "pt", "amount")

  test("asof picks the latest right row at-or-before each left time") {
    val out = AsofJoin.asof(clicks, purchases, Seq("u"), "t", "pt",
        Seq("pt", "amount"))
      .select("click_id", "pt", "amount")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((Some(10L), Some(1.0)))) // tie: <= matches
    assert(out(2L) == ((Some(20L), Some(2.0)))) // latest of two
    assert(out(3L) == ((None, None)))           // before any purchase
    assert(out(4L) == ((Some(50L), Some(3.0)))) // equal time
    assert(out(5L) == ((None, None)))           // user with no purchases
  }

  test("strict mode hides equal-time right rows") {
    val out = AsofJoin.asof(clicks, purchases, Seq("u"), "t", "pt",
        Seq("amount"), strict = true)
      .select("click_id", "amount")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == None)       // pt=10 == t=10 now hidden
    assert(out(4L) == None)       // pt=50 == t=50 hidden
    assert(out(2L) == Some(2.0))  // 20 < 25 still matches
  }

  test("every left row survives exactly once; plan has no join") {
    val joined = AsofJoin.asof(clicks, purchases, Seq("u"), "t", "pt",
      Seq("amount"))
    assert(joined.count() == clicks.count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("null times: left rows match nothing, right rows are ignored") {
    val l = Seq((1L, 100L, Some(10L)), (2L, 100L, None))
      .toDF("click_id", "u", "t")
    val r = Seq((100L, Some(5L), 1.0), (100L, None, 99.0))
      .toDF("u", "pt", "amount")
    val out = AsofJoin.asof(l, r, Seq("u"), "t", "pt", Seq("amount"))
      .select("click_id", "amount")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(1.0)) // null-ts right row never matches
    assert(out(2L) == None)      // null-ts left row matches nothing
  }

  test("agrees with the quadratic reference on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong))
    val r = (1 to 120).map(i =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong, i.toDouble))
      // dedupe (key, time) so the match is unique and the reference
      // comparison is well-defined
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val ld = l.toDF("id", "u", "t")
    val rd = r.toDF("u", "pt", "v")
    val got = AsofJoin.asof(ld, rd, Seq("u"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val byKey = r.groupBy(_._1)
    l.foreach { case (id, u, t) =>
      val want = byKey.getOrElse(u, Seq.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == want, s"id=$id u=$u t=$t")
    }
  }

  test("left frames using internal working column names are rejected") {
    val bad = clicks.withColumnRenamed("t", "__ts")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(bad, purchases, Seq("u"), "__ts", "pt",
        Seq("amount"))
    }
    assert(e.getMessage.contains("internal working columns"))
  }

  test("range-split matches the classic path on a single hot key " +
      "and spreads it over multiple tasks") {
    val rnd = new scala.util.Random(11)
    // ONE key owns every row — the classic path serializes this into a
    // single window task
    val l = (1 to 2000).map(i =>
      (i.toLong, 7L, rnd.nextInt(500).toLong))
    val r = (1 to 400).map(i => (7L, rnd.nextInt(500).toLong, i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val ld = l.toDF("id", "u", "t").repartition(8)
    val rd = r.toDF("u", "pt", "v").repartition(8)
    val classic = AsofJoin.asof(ld, rd, Seq("u"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val split = AsofJoin.asof(ld, rd, Seq("u"), "t", "pt", Seq("v"),
      splitParts = 8)
    val splitRows = split.select("id", "v")
      .as[(Long, Option[Double])].collect().toMap
    assert(splitRows == classic)
    // the hot key's rows must flow through more than one task: the
    // local-carry window partitions by range id, and the result keeps
    // that partitioning through the narrow finishing ops
    val nParts = split
      .withColumn("__part", spark_partition_id())
      .select("__part").distinct().count()
    assert(nParts > 1, s"hot key still serialized: $nParts partition(s)")
  }

  test("range-split agrees with classic on multi-key random data " +
      "(cross-partition carry, strict and non-strict)") {
    val rnd = new scala.util.Random(23)
    val l = (1 to 1500).map(i =>
      (i.toLong, (rnd.nextInt(3) + 1).toLong, rnd.nextInt(400).toLong))
    val r = (1 to 300).map(i =>
      ((rnd.nextInt(3) + 1).toLong, rnd.nextInt(400).toLong, i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val ld = l.toDF("id", "u", "t").repartition(5)
    val rd = r.toDF("u", "pt", "v").repartition(5)
    for (strict <- Seq(false, true)) {
      val classic = AsofJoin.asof(ld, rd, Seq("u"), "t", "pt",
          Seq("v"), strict = strict)
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
      val split = AsofJoin.asof(ld, rd, Seq("u"), "t", "pt",
          Seq("v"), strict = strict, splitParts = 7)
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
      assert(split == classic, s"strict=$strict")
    }
  }
}
