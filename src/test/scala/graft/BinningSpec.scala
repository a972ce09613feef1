package graft

import org.apache.spark.sql.functions._
import graft.operators._

class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("binIdExpr: threshold in lower bin, nulls stay null") {
    val df = Seq(Some(0.5), Some(1.0), Some(1.5), Some(2.0), Some(9.0),
      None).toDF("v")
    val out = df.select(Binning.binIdExpr(col("v"), Seq(1.0, 2.0)).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    // <=1.0 -> 0 (threshold lands in the LOWER bin, feature_fix.py:76-80)
    assert(out.toSeq == Seq(0, 0, 1, 1, 2, null))
  }

  test("equalWidthThresholds spans [lo,hi] with bins-1 cuts") {
    assert(Binning.equalWidthThresholds(0, 10, 5) == Seq(2.0, 4.0, 6.0, 8.0))
  }

  test("geometricThresholds: widths grow by r and span [lo,hi]") {
    val bins = 4
    val ts   = Binning.geometricThresholds(0, 15, bins, 2.0)
    // widths 1,2,4,8 sum to 15 -> thresholds 1,3,7
    assert(ts.size == bins - 1)
    assert(ts.zip(Seq(1.0, 3.0, 7.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 })
  }

  test("overlappingRanges widens bins, last open-ended") {
    val r = Binning.overlappingRanges(
      Seq((0, 0.0, 10.0), (1, 10.0, 20.0)), 0.1)
    assert(r(0) == ((0, -1.0, 11.0)))
    assert(r(1) == ((1, 9.0, 21.0))) // last: hi + 1
  }

  test("SplitIntoBins derives {col}_bin_id") {
    val df  = Seq(0.5, 5.0, 100.0).toDF("x")
    val out = SplitIntoBins(Seq("x"), Seq(1.0, 10.0))(df)
    assert(out.columns.toSeq == Seq("x", "x_bin_id"))
    assert(out.select("x_bin_id").as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("CombineCategoricalColumns follows itertools.product order") {
    val df = Seq(("b", "y"), ("a", "x"), ("b", "x"), ("a", "y"))
      .toDF("c1", "c2")
    // sorted dicts: a=0,b=1 × x=0,y=1; id = ord(c1)*2 + ord(c2)
    val ids = CombineCategoricalColumns(Seq("c1", "c2"))(df)
      .select("c1", "c2", "c1-c2_enc").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ids == Map(("a","x") -> 0L, ("a","y") -> 1L,
      ("b","x") -> 2L, ("b","y") -> 3L))
  }

  test("CombineCategoricalColumns: null in any source -> null id") {
    val df = Seq((Some("a"), Some("x")), (None, Some("x")),
      (Some("a"), None)).toDF("c1", "c2")
    val out = CombineCategoricalColumns(Seq("c1", "c2"))(df)
      .select("c1-c2_enc").collect()
    assert(!out(0).isNullAt(0) || out.count(_.isNullAt(0)) == 2)
    assert(out.count(_.isNullAt(0)) == 2)
  }

  test("GroupedBinning end-to-end: per-group bins, fallback, w=0, nulls") {
    // group a: 30 rows 0..29 (own range); group b: 5 rows (fallback to
    // global range); group c: 25 identical values (w=0 -> bin 0);
    // null group -> null bin.
    val rows =
      (0 until 30).map(i => (Some("a"), Some(i.toDouble))) ++
      (0 until 5).map(i => (Some("b"), Some(100.0 + i))) ++
      (0 until 25).map(_ => (Some("c"), Some(50.0))) ++
      Seq((Option.empty[String], Some(7.0)), (Some("a"), Option.empty[Double]))
    val df  = rows.toDF("g", "v")
    val out = GroupedBinning("g", "v", 5)(df)
    val got = out.collect().map { r =>
      (Option(r.getAs[String]("g")), Option(r.getAs[Double]("v")),
        if (r.isNullAt(r.fieldIndex("v_bin_id"))) None
        else Some(r.getAs[Int]("v_bin_id")))
    }
    // group a: range [0,29], w=5.8 -> v=0 bin0, v=29 bin4
    assert(got.contains((Some("a"), Some(0.0), Some(0))))
    assert(got.contains((Some("a"), Some(29.0), Some(4))))
    // group b (5 rows < 20): global range [0,104], w=20.8; v=100 ->
    // floor(100/20.8)=4
    assert(got.filter(_._1.contains("b")).forall(_._3.contains(4)))
    // group c: min==max -> w=0 -> bin 0
    assert(got.filter(_._1.contains("c")).forall(_._3.contains(0)))
    // null group and null value -> null bin
    assert(got.filter(t => t._1.isEmpty || t._2.isEmpty)
      .forall(_._3.isEmpty))
  }

  test("MultipleCombinations produces one combo column per prefix >= 2") {
    val df  = Seq(("a", "x", "1")).toDF("c1", "c2", "c3")
    val out = MultipleCombinations(Seq("c1", "c2", "c3"))(df)
    assert(out.columns.contains("c1-c2_enc"))
    assert(out.columns.contains("c1-c2-c3_enc"))
  }

  test("equalFrequencyBins balances counts on skewed data and keeps " +
      "null bins null") {
    import spark.implicits._
    // heavy tail: 1..80 plus 20 huge outliers — equal-WIDTH would put
    // 80% of rows in bin 0; equal-frequency must balance 4 x 25
    val vals = ((1 to 80).map(_.toDouble) ++
      (1 to 20).map(i => 1.0e6 + i)).map(Option(_)) :+
      (None: Option[Double])
    val df = vals.toDF("v")
    val out = Binning.equalFrequencyBins(df, "v", bins = 4)
      .select("v", "bin_id").collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getShort(1))))
    assert(out.collect { case (None, b) => b }.head.isEmpty)
    val counts = out.collect { case (Some(_), Some(b)) => b }
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(counts.keySet == Set(0.toShort, 1.toShort, 2.toShort,
      3.toShort))
    // quantile thresholds -> near-equal occupancy (interpolated cuts
    // allow +-1)
    assert(counts.values.forall(c => c >= 24 && c <= 26), counts)
  }

  test("MultipleCombinations shared-dictionary path == folding " +
      "CombineCategoricalColumns per prefix, nulls included") {
    // r19: MultipleCombinations fits each source column once for all
    // prefixes; this pins bit-equality against the definitional fold
    val df = Seq(
      ("a", "x", "1"), ("b", "y", "2"), ("a", "y", "1"),
      ("b", "x", "3"), (null, "x", "1"), ("a", null, "2"),
      ("b", "y", null)
    ).toDF("c1", "c2", "c3")
    val got = MultipleCombinations(Seq("c1", "c2", "c3"))(df)
    val want = (2 to 3).foldLeft(df) { (d, k) =>
      CombineCategoricalColumns(Seq("c1", "c2", "c3").take(k))(d)
    }
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
  }
}
