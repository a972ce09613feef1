package graft

import graft.core.{ColumnKind, Inference}

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("kinds: numeric, bool, string, mixed, all-castable string") {
    val df = Seq(
      (1.0, true, "abc", "12", "1.5x"),
      (2.0, false, "def", "34", "2.5")
    ).toDF("num", "boo", "str", "numstr", "mix")
    val c = Inference.classify(df)
    assert(c.kinds("num") == ColumnKind.Numerical)
    assert(c.kinds("boo") == ColumnKind.Bool)
    assert(c.kinds("str") == ColumnKind.Str)
    // all values castable -> the string column is "actually numeric"
    assert(c.kinds("numstr") == ColumnKind.Numerical)
    // partially castable -> mixed (the repair target)
    assert(c.kinds("mix") == ColumnKind.Mixed)
    assert(c.toBeFixedCols == Set("mix"))
  }

  test("{0,1}-valued columns promote to bool") {
    val df = Seq((0, "1"), (1, "0"), (0, "1")).toDF("zeroone", "zos")
    val c  = Inference.classify(df)
    assert(c.kinds("zeroone") == ColumnKind.Bool)
    assert(c.kinds("zos") == ColumnKind.Bool)
  }

  test("constant detection counts null as a value") {
    val df = Seq(
      (Some(5.0), Option.empty[Double], Some(5.0), Some(1.0)),
      (Some(5.0), Option.empty[Double], Option.empty[Double], Some(2.0))
    ).toDF("const", "allnull", "constWithNull", "varying")
    val c = Inference.classify(df)
    assert(c.constantCols.contains("const"))
    assert(c.constantCols.contains("allnull"))
    // 5.0 and null are TWO distinct values under nunique(dropna=False)
    assert(!c.constantCols.contains("constWithNull"))
    assert(!c.constantCols.contains("varying"))
  }

  test("categorical heuristic: nunique < 7 or < notnull/300") {
    val few  = (1 to 100).map(i => ("cat" + (i % 3), i.toDouble))
    val many = (1 to 100).map(i => ("val" + i, i.toDouble))
    val cFew  = Inference.classify(few.toDF("c", "v"))
    val cMany = Inference.classify(many.toDF("c", "v"))
    assert(cFew.categoricalCols.contains("c"))
    assert(!cMany.categoricalCols.contains("c"))
  }

  test("classificationDf reifies show_columns_type as a frame") {
    val ds = core.GraftDataset(
      Seq((1.0, "a"), (2.0, "b"), (2.0, "a")).toDF("num", "cat"))
    val rows = ds.classificationDf.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(6)))
      .toMap
    assert(rows("num")._1 == "Numerical")
    assert(rows("cat") == (("Str", true)))
  }

  test("exact=true: -0.0/0.0 collapse, binary and array columns") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (-0.0, Array[Byte](1, 2), Seq(1, 2)),
      (0.0, Array[Byte](1, 2), Seq(1, 2)),
      (1.5, Array[Byte](3), Seq(3))
    ).toDF("d", "b", "arr")
    val exact  = Inference.classify(df, exact = true)
    // aggregate semantics: -0.0 == 0.0 (NormalizeFloatingNumbers),
    // so the double column has TWO distinct values, not three
    assert(exact.stats("d").nDistinct == 2)
    // binary distinct via injective base64 keys
    assert(exact.stats("b").nDistinct == 2)
    // array distinct via per-value JSON
    assert(exact.stats("arr").nDistinct == 2)
    // and the approx path agrees on these tiny cardinalities
    val approx = Inference.classify(df)
    assert(approx.stats("d").nDistinct == 2)
    assert(approx.stats("b").nDistinct == 2)
  }

  test("exact=true on a 200-column frame: one job, correct counts") {
    import org.apache.spark.sql.functions._
    val wide = (0 until 200).foldLeft(
      spark.range(1000).toDF("id"))((d, i) =>
      d.withColumn(s"c$i", pmod(col("id") * (i + 1), lit(i + 2))))
    val before = Inference.distinctJobCount.get()
    val cls = Inference.classify(wide, exact = true)
    assert(Inference.distinctJobCount.get() - before == 1L)
    // c_i = (id * (i+1)) mod (i+2): i+1 and i+2 are coprime, so the
    // residues cycle through ALL of 0..i+1 -> exactly i+2 distinct
    (0 until 200 by 37).foreach { i =>
      assert(cls.stats(s"c$i").nDistinct == i + 2, s"column c$i")
    }
  }

  test("exact=true: correct distinct counts from ONE fused distinct job") {
    val df = Seq.tabulate(50)(i => (i % 7, i % 11, "s" + i % 13))
      .toDF("a", "b", "c")
    val before = Inference.distinctJobCount.get()
    val cls = Inference.classify(df, exact = true)
    assert(cls.stats("a").nDistinct == 7)
    assert(cls.stats("b").nDistinct == 11)
    assert(cls.stats("c").nDistinct == 13)
    // the exact path fuses all columns into one count_distinct agg —
    // one distinct job per classify call, never one per column
    assert(Inference.distinctJobCount.get() - before == 1L)
  }

  test("exact=true: map columns keyed by sorted entries, not key order") {
    // logically-equal maps with different key order must count as ONE
    // distinct value (to_json alone renders storage order)
    val df = Seq(
      Map("a" -> 1, "b" -> 2),
      Map("b" -> 2, "a" -> 1),
      Map("c" -> 3)
    ).toDF("m")
    val cls = Inference.classify(df, exact = true)
    assert(cls.stats("m").nDistinct == 2)
  }

  test("castability accepts inf/infinity/nan short special literals") {
    // pandas.to_numeric, DuckDB TRY_CAST and Spark try_cast all parse
    // these; the shape gate must not null them out
    val df = Seq("inf", "+inf", "-Inf", "INFINITY", "nan", "NaN",
      " -infinity ", "1.5", "notanumber").toDF("s")
    val ok = df.select(graft.functions.SafeCast
      .tryCastDouble(org.apache.spark.sql.functions.col("s")).as("d"))
      .collect().map(r => !r.isNullAt(0))
    assert(ok.toSeq == Seq(true, true, true, true, true, true,
      true, true, false))
  }
}
