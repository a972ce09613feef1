package graft

import graft.operators.ColumnStats

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame)
      : Map[(String, String), Option[Double]] =
    df.collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap

  test("perfect linear relationships hit exactly +-1") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i + 3, -1.0 * i))
      .toDF("x", "y", "z")
    val got = cells(ColumnStats.correlationMatrix(df,
      Seq("x" -> 1, "y" -> 1, "z" -> 1)))
    assert(got(("x", "y")) == Some(1.0))
    assert(got(("x", "z")) == Some(-1.0))
    assert(got(("y", "z")) == Some(-1.0))
  }

  test("matches a driver-side exact-integer reference") {
    val data = (0 until 50).map { i =>
      (((i * 7) % 13).toDouble, ((i * 11) % 17).toDouble)
    }
    val got = cells(ColumnStats.correlationMatrix(
      data.toDF("a", "b"), Seq("a" -> 1, "b" -> 1)))(("a", "b")).get
    val n  = data.length.toDouble
    val sa = data.map(_._1).sum
    val sb = data.map(_._2).sum
    val paa = data.map(d => d._1 * d._1).sum
    val pbb = data.map(d => d._2 * d._2).sum
    val pab = data.map(d => d._1 * d._2).sum
    val want = (n * pab - sa * sb) /
      (math.sqrt(n * paa - sa * sa) * math.sqrt(n * pbb - sb * sb))
    assert(got == want)
  }

  test("zero-variance column yields null, not NaN/Inf") {
    val df = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("x", "c")
    val got = cells(ColumnStats.correlationMatrix(df,
      Seq("x" -> 1, "c" -> 1)))
    assert(got(("x", "c")).isEmpty)
  }

  test("complete-case: a null in any column drops the whole row") {
    val withNull = Seq((1.0, 1.0, Some(9.0)), (2.0, 2.0, None),
      (3.0, 3.0, Some(1.0)), (4.0, 4.0, Some(5.0)))
      .toDF("x", "y", "z")
    val clean = Seq((1.0, 1.0, 9.0), (3.0, 3.0, 1.0), (4.0, 4.0, 5.0))
      .toDF("x", "y", "z")
    val a = cells(ColumnStats.correlationMatrix(withNull,
      Seq("x" -> 1, "y" -> 1, "z" -> 1)))
    val b = cells(ColumnStats.correlationMatrix(clean,
      Seq("x" -> 1, "y" -> 1, "z" -> 1)))
    assert(a == b)
  }

  test("scale is applied before rounding to the integer grid") {
    // 0.04 vs 0.05: identical at scale 1 (both round to 0), distinct
    // at scale 100
    val df = Seq((1.0, 0.04), (2.0, 0.05), (3.0, 0.04), (4.0, 0.10))
      .toDF("x", "r")
    val coarse = cells(ColumnStats.correlationMatrix(df,
      Seq("x" -> 1, "r" -> 1)))(("x", "r"))
    val fine = cells(ColumnStats.correlationMatrix(df,
      Seq("x" -> 1, "r" -> 100)))(("x", "r"))
    assert(coarse.isEmpty) // all-zero grid: zero variance
    assert(fine.nonEmpty)
  }

  test("one aggregation: a single shuffle in the plan") {
    val df = (1 to 20).map(i => (i.toDouble, (i * i).toDouble))
      .toDF("x", "y")
    val plan = ColumnStats.correlationMatrix(df,
      Seq("x" -> 1, "y" -> 1)).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected <= 1 shuffle, plan:\n$plan")
  }

  test("a sum past 2^53 fails loudly instead of losing precision") {
    val big = (1 to 4).map(_ => 9.0e15).toDF("x")
      .selectExpr("x", "x AS y")
    val e = intercept[Exception] {
      ColumnStats.correlationMatrix(big, Seq("x" -> 1, "y" -> 1))
        .collect()
    }
    assert(e.getMessage.contains("2^53") ||
      e.getCause != null && e.getCause.getMessage.contains("2^53"),
      s"unexpected error: ${e.getMessage}")
  }

  test("groupedCorrelationMatrix equals per-group correlationMatrix") {
    val df = (0 until 60).map { i =>
      (s"g${i % 3}", i.toDouble, ((i * i) % 37).toDouble)
    }.toDF("g", "x", "y")
    val cols = Seq("x" -> 1, "y" -> 1)
    val grouped = ColumnStats.groupedCorrelationMatrix(df, "g", cols)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val single = cells(ColumnStats.correlationMatrix(
        df.filter($"g" === g), cols))(("x", "y"))
      assert(grouped(g) == single, s"group $g")
    }
  }

  test("groupedCorrelationMatrix: one shuffle, group column rejected " +
      "as a measure") {
    val df = (1 to 20).map(i => ("g", i.toDouble, (i * 2).toDouble))
      .toDF("g", "x", "y")
    val plan = ColumnStats.groupedCorrelationMatrix(df, "g",
      Seq("x" -> 1, "y" -> 1)).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length <= 1, plan)
    intercept[IllegalArgumentException] {
      ColumnStats.groupedCorrelationMatrix(df, "g",
        Seq("g" -> 1, "x" -> 1))
    }
  }

  test("winsorize clips to the exact interpolated quantiles and " +
      "keeps nulls") {
    val df = ((1 to 99).map(_.toDouble) :+ 1000.0)
      .map(Option(_)).:+(None: Option[Double]).toDF("v")
    val out = ColumnStats.winsorize(df, "v", 0.1, 0.9)
      .select("v").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.contains(None)) // null preserved
    val vals = out.flatten
    // exact p10/p90 over the 100 non-null values: r = p*(n-1) = 9.9
    // -> 10.9 + 0.9*(11.9-10.9)... values are 1..99,1000: sorted(k)
    val sorted = ((1 to 99).map(_.toDouble) :+ 1000.0).sorted
    def q(p: Double): Double = {
      val r = p * 99; val lo = r.toInt; val hi = math.ceil(r).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (r - lo)
    }
    assert(vals.min == q(0.1) && vals.max == q(0.9))
    assert(vals.forall(v => v >= q(0.1) && v <= q(0.9)))
    // interior values untouched
    assert(vals.count(_ == 50.0) == 1)
  }

  test("robustZScore centers on the median and scales by MAD; " +
      "degenerate MAD and nulls yield null") {
    // values 1..9 plus an outlier: median 5.5? n=10 values 1..9,100:
    // r = 0.5*9 = 4.5 -> between sorted(4)=5 and sorted(5)=6 -> 5.5
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(Option(_))
      .:+(None: Option[Double]).toDF("v")
    val out = ColumnStats.robustZScore(df, "v").select("v", "robust_z")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(None).isEmpty) // null value -> null score
    // MAD: deviations |x-5.5| = 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,
    // 94.5 -> sorted, median = 2.5
    val (med, mad) = (5.5, 2.5)
    assert(out(Some(1.0)) == Some((1.0 - med) / mad))
    assert(out(Some(100.0)) == Some((100.0 - med) / mad))
    // constant column: MAD 0 -> null scores
    val const = (1 to 8).map(_ => 3.0).toDF("v")
    val cz = ColumnStats.robustZScore(const, "v")
      .select("robust_z").collect()
    assert(cz.forall(_.isNullAt(0)))
  }

  test("percentileRank is cume_dist: ties share count(<=)/n, nulls " +
      "rank null") {
    val df = Seq(Some(10.0), Some(20.0), Some(20.0), Some(30.0), None)
      .toDF("v")
    val got = ColumnStats.percentileRank(df, "v")
      .select("v", "pct_rank").collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    // n = 4 non-null: 10 -> 1/4; the tied 20s both -> 3/4; 30 -> 1
    assert(got == Set(
      (Some(10.0), Some(0.25)), (Some(20.0), Some(0.75)),
      (Some(30.0), Some(1.0)), (None, None)))
  }

  test("driftReport: exact means, null fractions and deltas; empty " +
      "side degrades to null means") {
    val oldDf = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x")
    val newDf = Seq(Some(4.0), Some(6.0)).toDF("x")
    val r = ColumnStats.driftReport(oldDf, newDf, Seq("x")).collect()(0)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_old") == 4L && m("n_new") == 2L)
    assert(m("null_frac_old") == 0.25 && m("null_frac_new") == 0.0)
    assert(m("mean_old") == 2.0 && m("mean_new") == 5.0)
    assert(m("mean_delta") == 3.0)
    // an empty snapshot yields null mean/delta, never a throw
    val e = ColumnStats.driftReport(oldDf.limit(0), newDf,
      Seq("x")).collect()(0)
    assert(e.isNullAt(e.fieldIndex("mean_old")) &&
      e.isNullAt(e.fieldIndex("mean_delta")))
  }

  test("categoricalDriftReport: exact frequencies, one-sided " +
      "categories at 0, null category is ONE category") {
    val oldDf = Seq(Some("a"), Some("a"), Some("b"), None)
      .toDF("c")
    val newDf = Seq(Some("a"), Some("x"), None, None).toDF("c")
    val got = ColumnStats.categoricalDriftReport(oldDf, newDf,
        Seq("c")).collect()
      .map(r => (Option(r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(Some("a")) == (2L, 1L, 0.5, 0.25))
    assert(got(Some("b")) == (1L, 0L, 0.25, 0.0))   // one-sided old
    assert(got(Some("x")) == (0L, 1L, 0.0, 0.25))   // one-sided new
    assert(got(None) == (1L, 2L, 0.25, 0.5))        // null = one row
    assert(got.size == 4)
  }

  test("groupedWinsorize clips per group; null-group rows pass " +
      "through unclipped") {
    val df = ((1 to 20).map(i => (Some("a"), i.toDouble)) ++
      (1 to 20).map(i => (Some("b"), i * 100.0)) :+
      ((None: Option[String]), 1.0e9)).toDF("g", "v")
    val out = ColumnStats.groupedWinsorize(df, "g", "v", 0.1, 0.9)
      .select("g", "v").collect().map(r =>
        (Option(r.getString(0)), r.getDouble(1)))
    val a = out.collect { case (Some("a"), v) => v }
    val b = out.collect { case (Some("b"), v) => v }
    // group a clips to ITS OWN [p10, p90] — expectations via the
    // operator's exact interpolation formula (decimal literals like
    // 2.9 differ in the last ulp from 2 + 0.9*(3-2))
    def interp(vLo: Double, vHi: Double, r: Double): Double =
      vLo + (vHi - vLo) * (r - math.floor(r))
    val (rLo, rHi) = (0.1 * 19, 0.9 * 19)
    assert(a.min == interp(2.0, 3.0, rLo) &&
      a.max == interp(18.0, 19.0, rHi))
    // group b's thresholds are 100x — a's tail must not leak in
    assert(b.min == interp(200.0, 300.0, rLo) &&
      b.max == interp(1800.0, 1900.0, rHi))
    // null group: untouched
    assert(out.collect { case (None, v) => v }.head == 1.0e9)
  }

  test("groupedRobustZScore scores against the OWN group's " +
      "median/MAD; null groups and degenerate MAD score null") {
    val df = (Seq.tabulate(9)(i => (Some("a"), (i + 1).toDouble)) ++
      Seq((Some("a"), 100.0)) ++
      Seq.tabulate(8)(_ => (Some("b"), 7.0)) :+
      ((None: Option[String]), 5.0)).toDF("g", "v")
    val got = ColumnStats.groupedRobustZScore(df, "g", "v")
      .select("g", "v", "robust_z").collect().map(r =>
        ((Option(r.getString(0)), r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // group a mirrors the global robustZScore fixture: med 5.5, MAD 2.5
    assert(got((Some("a"), 1.0)) == Some((1.0 - 5.5) / 2.5))
    assert(got((Some("a"), 100.0)) == Some((100.0 - 5.5) / 2.5))
    // constant group b: MAD 0 -> null, a's spread must not leak in
    assert(got((Some("b"), 7.0)).isEmpty)
    // null group: no population
    assert(got((None, 5.0)).isEmpty)
  }

  test("iqrOutliers flags the planted tail, not the bulk; nulls " +
      "flag null") {
    // 1..100 uniform plus two spikes; Q1=25.75, Q3=75.25, IQR=49.5:
    // fences [-48.5, 149.5] -> only the spikes are out
    val df = ((1 to 100).map(_.toDouble) ++ Seq(1000.0, -500.0))
      .map(Option(_)).:+(None: Option[Double]).toDF("v")
    val out = ColumnStats.iqrOutliers(df, "v").select("v", "is_outlier")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(out(Some(1000.0)) == Some(true))
    assert(out(Some(-500.0)) == Some(true))
    assert(out(Some(50.0)) == Some(false))
    assert(out(Some(1.0)) == Some(false)) // inside the low fence
    assert(out(None).isEmpty)
  }

  test("duplicate or too-few columns are rejected") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ColumnStats.correlationMatrix(df, Seq("x" -> 1))
    }
    intercept[IllegalArgumentException] {
      ColumnStats.correlationMatrix(df, Seq("x" -> 1, "x" -> 1))
    }
  }
}
