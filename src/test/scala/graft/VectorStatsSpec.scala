package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorStats

class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupCentroids computes exact per-dimension means") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)),
      ("a", Array(3.0f, 4.0f)),
      ("b", Array(10.0f, -10.0f))).toDF("g", "v")
    val out = VectorStats.groupCentroids(df, "g", "v")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(out == Set(
      ("a", 0L, 2.0, 2L), ("a", 1L, 3.0, 2L),
      ("b", 0L, 10.0, 1L), ("b", 1L, -10.0, 1L)))
  }

  test("groupCentroids is partitioning-invariant (exact int sums)") {
    val df = (1 to 400)
      .map(i => (i % 3, Array.tabulate(8)(j => (i * 0.137f + j) % 1.0f)))
      .toDF("g", "v")
    def run(parts: Int) =
      VectorStats.groupCentroids(df.repartition(parts), "g", "v")
        .as[(Int, Long, Double, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("groupCentroids single shuffle with map-side partial agg") {
    val df = Seq(("a", Array(1.0f))).toDF("g", "v")
    val plan = VectorStats.groupCentroids(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one shuffle in:\n$plan")
  }

  test("centroidOutliers flags the planted far point, not the " +
      "cluster; null labels drop") {
    import spark.implicits._
    // 39 points near (1,0), one planted at (9,9); second label's own
    // tight cluster must not be polluted by label 1's threshold
    val rows = (1 to 39).map(i =>
        (i.toLong, Some(1), Seq(1.0f + i * 0.001f, 0.0f))) ++
      Seq((40L, Some(1), Seq(9.0f, 9.0f))) ++
      (41 to 60).map(i => (i.toLong, Some(2),
        Seq(-5.0f, -5.0f + i * 0.001f))) ++
      Seq((99L, None: Option[Int], Seq(0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = VectorStats
      .centroidOutliers(df, "label", "embedding", p = 0.9)
      .select("vec_id", "is_outlier").as[(Long, Boolean)]
      .collect().toMap
    assert(got(40L), "planted far point not flagged")
    assert(!got.contains(99L), "null-label row should drop")
    // a p-quantile threshold flags ~(1-p) of each group: the planted
    // point plus at most the cluster's thin tail, never the bulk
    assert(got.count { case (id, o) => id <= 40L && o } <= 5)
    assert(got.count { case (id, o) => id >= 41L && o } <= 2)
    assert(got.size == 60)
  }
}
