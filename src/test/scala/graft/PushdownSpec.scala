package graft

import org.apache.spark.sql.functions._

/** Scan-shape contract (round 18): filters reach the parquet scan
  * as PushedFilters and projections prune ReadSchema — the two
  * properties that decide whether a 100 TB read touches terabytes
  * or gigabytes. Pinned on the LIVE library queries (not toy
  * frames), so a refactor that breaks pushdown — a UDF wrapper, an
  * opaque cast, a mapPartitions inserted before the filter —
  * fails here instead of shipping a full-scan plan.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"))
  }

  test("library queries push their filters into the parquet scan") {
    // the interval range-join path filters not-null before joining
    val overlap = formatted("q_overlap_binning")
    assert(overlap.contains("PushedFilters: [IsNotNull(l_extendedprice)]"),
      s"q_overlap_binning lost its pushed filter:\n$overlap")
    // the windowed-events path pushes the watermark column's
    // not-null
    val events = formatted("q_events_window")
    assert(events.contains("PushedFilters: [IsNotNull(ts)]"),
      s"q_events_window lost its pushed filter:\n$events")
  }

  test("library queries prune ReadSchema to the touched columns") {
    // q_binning touches exactly 3 of lineitem's 16 columns — the
    // scan must read ONLY those
    val binning = formatted("q_binning")
    assert(binning.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_extendedprice:double>"),
      s"q_binning reads more than its 3 columns:\n$binning")
    // q_ordinal_encode: 2 of orders' 9 columns
    val ord = formatted("q_ordinal_encode")
    assert(ord.contains("ReadSchema: struct<o_orderkey:bigint," +
      "o_orderpriority:string>"),
      s"q_ordinal_encode reads more than its 2 columns:\n$ord")
  }

  test("a range predicate pushes as comparison filters, and the " +
      "pushed scan returns the same rows as a post-scan filter") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val q = li.filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"))
    assert(plan.contains("GreaterThan(l_quantity,45.0)"),
      s"range predicate not pushed:\n$plan")
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
    // semantics unchanged by the pushdown: compare against a
    // deliberately unpushable filter over the same data
    val opaque = li.select("l_orderkey", "l_quantity")
      .filter((col("l_quantity") + 0.0) > 45.0) // arithmetic blocks pushdown
    assert(q.count() == opaque.count())
    assert(q.count() > 0)
  }
}
