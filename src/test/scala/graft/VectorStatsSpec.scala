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
}
