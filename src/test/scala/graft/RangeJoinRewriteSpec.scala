package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = (1 to 500).map(i => (i.toLong, i / 7.0))
    .toDF("pid", "x")
  private lazy val ivs = (1 to 200).map(i => (i.toLong, i / 4.0,
      i / 4.0 + 2.0))
    .toDF("iid", "lo", "hi")

  private def rangeJoin() = pts.join(ivs,
    col("x") >= col("lo") && col("x") <= col("hi"))

  test("rewrite turns a SQL range join into a chunked equi-join") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val df = rangeJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      // results identical to the un-rewritten predicate semantics
      val got = df.select("pid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      val want = rangeJoin().select("pid", "iid")
        .as[(Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("rewrite is off without the width conf") {
    RangeJoinRewrite.install(spark)
    val plan = rangeJoin().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct"), s"expected untouched plan:\n$plan")
  }

  test("joins with extra non-range conditions are left alone") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val df = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi") &&
          col("pid") =!= col("iid"))
      // must still be CORRECT (rule shouldn't fire on a 3-conjunct
      // condition it doesn't understand)
      val got = df.select("pid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      val want = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi") &&
          col("pid") =!= col("iid"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("strict bounds rewrite too, with exact semantics preserved") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val df = pts.join(ivs,
        col("x") > col("lo") && col("x") < col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"strict miss:\n$plan")
      val got = df.select("pid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      val want = pts.join(ivs,
        col("x") > col("lo") && col("x") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("string range joins are left untouched (chunk cast would null)") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val sPts = Seq(("p1", "cat"), ("p2", "dog"), ("p3", "zebra"))
        .toDF("pid", "w")
      val sIvs = Seq(("i1", "a", "m"), ("i2", "c", "e"))
        .toDF("iid", "slo", "shi")
      val df = sPts.join(sIvs,
        col("w") >= col("slo") && col("w") <= col("shi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"),
        s"string join must NOT be rewritten:\n$plan")
      val got = df.select("pid", "iid").as[(String, String)]
        .collect().toSet
      assert(got == Set(("p1", "i1"), ("p1", "i2"), ("p2", "i1"),
        ("p2", "i2")))
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("date range joins are left untouched (no valid double cast)") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val dPts = Seq("2024-01-05", "2024-03-01").toDF("d")
        .select(to_date(col("d")).as("d"))
      val dIvs = Seq(("2024-01-01", "2024-02-01")).toDF("dlo", "dhi")
        .select(to_date(col("dlo")).as("dlo"), to_date(col("dhi")).as("dhi"))
      val df = dPts.join(dIvs,
        col("d") >= col("dlo") && col("d") <= col("dhi"))
      // must plan and return the single contained date
      assert(df.count() == 1)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("timestamp range joins DO rewrite (epoch-second chunks)") {
    RangeJoinRewrite.install(spark)
    try {
      // width in seconds for timestamps
      spark.conf.set(RangeJoinRewrite.WidthKey, "3600.0")
      val tPts = (0 until 200).map(i => i * 97L).toDF("s")
        .select(col("s").as("sid"), timestamp_seconds(col("s")).as("t"))
      val tIvs = (0 until 40).map(i => (i.toLong, i * 500L, i * 500L + 900L))
        .toDF("iid", "lo_s", "hi_s")
        .select(col("iid"), timestamp_seconds(col("lo_s")).as("tlo"),
          timestamp_seconds(col("hi_s")).as("thi"))
      val df = tPts.join(tIvs,
        col("t") >= col("tlo") && col("t") <= col("thi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"timestamp miss:\n$plan")
      val got = df.select("sid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      val want = tPts.join(tIvs,
        col("t") >= col("tlo") && col("t") <= col("thi"))
        .select("sid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("point and bounds may swap sides") {
    RangeJoinRewrite.install(spark)
    try {
      spark.conf.set(RangeJoinRewrite.WidthKey, "2.0")
      val df = ivs.join(pts,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"swap-side miss:\n$plan")
      val got = df.select("pid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      val want = ivs.join(pts,
        col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }
}
