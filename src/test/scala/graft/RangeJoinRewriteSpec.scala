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
