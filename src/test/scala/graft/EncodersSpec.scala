package graft

import org.apache.spark.sql.functions._
import graft.operators._

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("OneHotEncoder: sorted categories, null rows null everywhere") {
    val df  = Seq(Some("b"), Some("a"), None, Some("b")).toDF("c")
    val out = OneHotEncoder(Seq("c"), "_enc")(df)
    assert(out.columns.toSeq == Seq("c", "c_a_enc", "c_b_enc"))
    val rows = out.collect()
    val byVal = rows.map(r => Option(r.getString(0)) ->
      (if (r.isNullAt(1)) null else r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getBoolean(2))).toMap
    assert(byVal(Some("a")) == ((true, false)))
    assert(byVal(Some("b")) == ((false, true)))
    assert(byVal(None) == ((null, null))) // reference :637-656
  }

  test("OneHotEncoder records discovered categories on the applied op") {
    val df = Seq("y", "x").toDF("c")
    val ds = core.GraftDataset(df)
    val applied = OneHotEncoder(Seq("c"), "_enc")(ds)
    val op = applied.history(0).asInstanceOf[OneHotEncoder]
    assert(op.categoriesOut == Seq("x", "y"))
    assert(op.derivedColumns == Seq("c_x_enc", "c_y_enc"))
  }

  test("OrdinalEncoder: codes are sorted-distinct indices") {
    val df  = Seq("abr", "abc", "abr", "zzz").toDF("c")
    val out = OrdinalEncoder(Seq("c"), Seq("code"))(df)
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pinned by the reference golden: abc->0, abr->1
    assert(m == Map("abc" -> 0L, "abr" -> 1L, "zzz" -> 2L))
  }

  test("OrdinalEncoder in-place when no derived column given") {
    val df  = Seq("b", "a").toDF("c")
    val out = OrdinalEncoder(Seq("c"))(df)
    assert(out.columns.toSeq == Seq("c"))
    assert(out.as[Long].collect().sorted.toSeq == Seq(0L, 1L))
  }

  test("null values encode to null") {
    val df  = Seq(Some("a"), None).toDF("c")
    val out = OrdinalEncoder(Seq("c"), Seq("code"))(df)
    assert(out.filter(col("c").isNull).select("code")
      .collect()(0).isNullAt(0))
  }
}
