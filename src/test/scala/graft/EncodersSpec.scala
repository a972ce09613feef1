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

/** Single-fit contract: applying an encoder to a GraftDataset runs its
  * dictionary fit exactly ONCE (the applied-op copy is reused for the
  * output frame), and executing the result triggers no further fit —
  * previously the history record and the transform each fit
  * independently, doubling every distinct-collect job.
  */
class SingleFitSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators._

  private def fitsDuring(body: => core.GraftDataset): Long = {
    val before = DictionaryFit.fitCount.get()
    val out    = body
    out.data.collect() // transform must not re-fit at execution either
    DictionaryFit.fitCount.get() - before
  }

  test("OrdinalEncoder fits once per dataset application") {
    val ds = core.GraftDataset(Seq("b", "a", "b").toDF("c"))
    assert(fitsDuring(OrdinalEncoder(Seq("c"), Seq("c_enc"))(ds)) == 1L)
  }

  test("OneHotEncoder fits once per dataset application") {
    val ds = core.GraftDataset(Seq("b", "a", "b").toDF("c"))
    assert(fitsDuring(OneHotEncoder(Seq("c"))(ds)) == 1L)
  }

  test("EncodeSingleCategorical fits once per dataset application") {
    val ds = core.GraftDataset(Seq("b", "a", null).toDF("c"))
    assert(fitsDuring(EncodeSingleCategorical("c")(ds)) == 1L)
    assert(fitsDuring(EncodeSingleCategorical("c", method = "onehot",
      force = true)(ds)) == 1L)
  }

  test("fitted op copy carries the dictionary into history") {
    val ds  = core.GraftDataset(Seq("b", "a").toDF("c"))
    val out = OrdinalEncoder(Seq("c"), Seq("c_enc"))(ds)
    val op  = out.history(0).asInstanceOf[OrdinalEncoder]
    assert(op.encodedValuesMap == Seq(("a", 0L), ("b", 1L)))
  }
}
