package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 20000).map { i =>
    val key = if (i % 3 == 0) "a" else "b"
    (key, s"user_${i % 1500}", i % 2) // 1500 distinct users, 2 halves
  }
  private lazy val df = rows.toDF("k", "user", "half")

  test("sketch estimates are close to exact distinct counts") {
    val est = Sketches.estimate(
        Sketches.groupDistinctSketch(df, Seq("k"), "user"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("k").agg(count_distinct(col("user")))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05,
        s"k=$k est=${est(k)} exact=$n")
    }
  }

  test("merged increment sketches track the full-recompute sketch") {
    // sketch each half separately (the daily-increment shape), merge,
    // and compare against sketching everything at once. The union may
    // hold a promoted register representation (HLL_8 vs HLL_4), so the
    // estimates can differ in the last unit — but both must stay within
    // the error bound of the exact count, which is what increments are
    // FOR.
    val halves = Sketches.groupDistinctSketch(
      df, Seq("k", "half"), "user")
    val merged = Sketches.estimate(
        Sketches.mergeSketches(halves.drop("half"), Seq("k")))
      .as[(String, Long)].collect().toMap
    val full = Sketches.estimate(
        Sketches.groupDistinctSketch(df, Seq("k"), "user"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("k").agg(count_distinct(col("user")))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - full(k)).toDouble /
        math.max(full(k), 1) < 0.01, s"k=$k merged vs full")
      assert(math.abs(merged(k) - n).toDouble / n < 0.05,
        s"k=$k merged=${merged(k)} exact=$n")
    }
  }

  test("sketch shuffle carries partial aggregates, not values") {
    val plan = Sketches.groupDistinctSketch(df, Seq("k"), "user")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_hll_sketch_agg"),
      s"expected map-side partial sketch agg in:\n$plan")
  }

  test("topTermsApprox equals the exact top terms under capacity, " +
      "on any partitioning") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val exact = graft.operators.CorpusScrub
      .topTerms(docs, "text", 20).as[(String, Long)].collect().toSeq
    for (parts <- Seq(1, 7)) {
      val approx = Sketches
        .topTermsApprox(docs.repartition(parts), "text", 20)
        .as[(String, Long)].collect().toSeq
      assert(approx == exact, s"at $parts partitions")
    }
  }
}
