package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.operators._

/** Specs for the round-2 parity gaps: lost-value sets (A6), per-value
  * error reports (R8), P7/P8 helpers, typed exceptions, and the
  * geometric/overlapping binning wiring (B4/B5).
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  test("lostValues: distinct values a plain cast would null") {
    val df = Seq("1.5", "1,5", "1,5", "NV", "2.0").toDF("c")
    val lost = RowFix.lostValues(df, "c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lost == Map("1,5" -> 2L, "NV" -> 1L))
  }

  test("errorReport: offending values with counts, before and after") {
    val df = Seq("1.5", "1,5", "garbage", "garbage", "NV").toDF("c")
    val rep = RowFix.errorReport(df, Seq("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(rep == Set(
      ("c", "before", "1,5", 1L), ("c", "before", "garbage", 2L),
      ("c", "before", "NV", 1L),
      ("c", "after", "garbage", 2L)))
  }

  test("columnNames maps ids, rejects out-of-range") {
    val ds = GraftDataset(Seq(("a", "b")).toDF("x", "y"))
    assert(ds.columnNames(Seq(1, 0)) == Seq("y", "x"))
    intercept[IllegalArgumentException] { ds.columnNames(Seq(2)) }
  }

  test("duplicatedColumns surfaces duplicate names") {
    val df = Seq((1, 2)).toDF("x", "y").select(col("x"), col("y"),
      col("x").as("y"))
    assert(GraftDataset(df).duplicatedColumns == Seq("y"))
    assert(GraftDataset(Seq(1).toDF("x")).duplicatedColumns.isEmpty)
  }

  test("typed exceptions surface from lineage and io") {
    val fill = FillNA(Seq("a"), "x", Seq("d"))
    val l = OperationsList() :+ fill
    intercept[OperationNotFoundException] {
      l.originalColumnsFromDerived("nope")
    }
    intercept[MultipleOperationsFoundException] {
      (l :+ ReplaceStrings(Seq("a"), Seq("p" -> "q"), Seq("d")))
        .originalColumnsFromDerived("d")
    }
    intercept[NotGraftDatasetException] {
      graft.sources.Io.readDataset(spark, "/tmp/not_a_dataset_xyz")
    }
  }

  test("GroupedGeometricBinning: widths double per bin") {
    // group g: values 0..30 -> range [0,30], w0 = 30/31; thresholds
    // ~0.97, 2.9, 6.8, 14.5 -> value 30 in last bin, 0 in bin 0
    val df = (0 to 30).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = GroupedGeometricBinning("g", "v", 5)(df)
      .select("v", "v_bin_id").as[(Double, Int)].collect().toMap
    assert(out(0.0) == 0)
    assert(out(1.0) == 1)   // > 0.968
    assert(out(3.0) == 2)   // > 2.90
    assert(out(7.0) == 3)   // > 6.77
    assert(out(15.0) == 4)  // > 14.5
    assert(out(30.0) == 4)
  }

  test("GroupedGeometricBinning: small group falls back to global range") {
    val df = ((0 to 30).map(i => ("big", i.toDouble)) ++
      Seq(("tiny", 30.0))).toDF("g", "v")
    val out = GroupedGeometricBinning("g", "v", 5)(df)
    val tiny = out.filter(col("g") === "tiny")
      .select("v_bin_id").as[Int].collect()(0)
    assert(tiny == 4) // global range is [0,30]; 30 is in the top bin
  }

  test("OverlappingBinning duplicates rows in overlap zones") {
    val ranges = Seq((0, 0.0, 12.0), (1, 8.0, 20.0))
    val df  = Seq(5.0, 10.0, 15.0, 25.0).toDF("v")
    val out = OverlappingBinning(Seq("v"), ranges)(df)
      .select("v", "v_bin_id").as[(Double, Int)].collect().sorted
    // 5 -> bin 0; 10 -> bins 0 AND 1 (duplicated); 15 -> bin 1;
    // 25 -> dropped (no covering range)
    assert(out.toSeq == Seq((5.0, 0), (10.0, 0), (10.0, 1), (15.0, 1)))
  }
}
