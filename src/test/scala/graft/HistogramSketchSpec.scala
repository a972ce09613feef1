package graft

import org.apache.spark.sql.functions._
import graft.operators.HistogramSketch

class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private val vals = (1 to 97).map(i => (i * 37 % 5) match {
    case g => (s"g$g", (i * i * 13 % 1000).toLong)
  })
  private val df = vals.toDF("k", "v")

  /** Independent exact ceil-rank quantile on the raw values. */
  private def exact(xs: Seq[Long], pMicro: Long): Long = {
    val s = xs.sorted
    val rank = ((pMicro * s.length + 999999L) / 1000000L).toInt
    s(math.max(rank - 1, 0))
  }

  test("width 1 = exact quantiles; estimates within width otherwise") {
    for (width <- Seq(1L, 50L)) {
      val sk = HistogramSketch.fit(df, "v", Seq("k"), width)
      val est = HistogramSketch.quantileEstimate(sk, Seq("k"), width,
          Seq(500000L, 900000L, 1000000L))
        .as[(String, Long, Long)].collect()
        .map { case (k, p, e) => (k, p) -> e }.toMap
      for ((k, group) <- vals.groupBy(_._1); p <- Seq(500000L,
          900000L, 1000000L)) {
        val ex = exact(group.map(_._2), p)
        val e = est((k, p))
        if (width == 1L) assert(e == ex, s"$k p$p")
        // the picked bucket IS the exact value's bucket: the estimate
        // is its lower bound, within one width below the exact value
        else assert(e <= ex && ex < e + width, s"$k p$p")
      }
    }
  }

  test("hand golden: ceil-rank semantics") {
    val d = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L))
      .toDF("k", "v")
    val sk = HistogramSketch.fit(d, "v", Seq("k"), 1L)
    val est = HistogramSketch.quantileEstimate(sk, Seq("k"), 1L,
        Seq(500000L, 250000L, 1000000L))
      .as[(String, Long, Long)].collect()
      .map { case (_, p, e) => p -> e }.toMap
    assert(est(250000L) == 10L) // ceil(.25*4)=1 -> 1st value
    assert(est(500000L) == 20L) // ceil(.5*4)=2 -> 2nd
    assert(est(1000000L) == 40L) // rank 4 -> max
  }

  test("merge of disjoint increments == single full fit, any order") {
    val parts = Seq(
      df.filter(col("v") % 3 === 0), df.filter(col("v") % 3 === 1),
      df.filter(col("v") % 3 === 2))
    val full = HistogramSketch.fit(df, "v", Seq("k"), 25L)
      .as[(String, Long, Long)].collect().toSet
    for (perm <- Seq(parts, parts.reverse)) {
      val m = HistogramSketch
        .merge(perm.map(HistogramSketch.fit(_, "v", Seq("k"), 25L)),
          Seq("k"))
        .as[(String, Long, Long)].collect().toSet
      assert(m == full)
    }
  }

  test("nulls drop; fit is one aggregation (no per-row shuffle rows)") {
    val d = Seq(("a", Some(5L)), ("a", None), ("a", Some(7L)))
      .toDF("k", "v")
    val sk = HistogramSketch.fit(d, "v", Seq("k"), 10L)
      .as[(String, Long, Long)].collect()
    assert(sk.toSeq == Seq(("a", 0L, 2L)))
    // partial aggregation present: two HashAggregates around the
    // exchange, so the shuffle carries (key,bucket) partials
    val plan = HistogramSketch.fit(df, "v", Seq("k"), 10L)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }
}
