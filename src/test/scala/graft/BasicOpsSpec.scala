package graft

import org.apache.spark.sql.functions._
import graft.core.GraftDataset
import graft.operators._

class BasicOpsSpec extends SparkSpec {
  import spark.implicits._

  test("FillNA in place and derived") {
    val df = Seq(Some("a"), None).toDF("c")
    assert(FillNA(Seq("c"), "X")(df).as[String].collect().toSeq ==
      Seq("a", "X"))
    val d = FillNA(Seq("c"), "X", Seq("c2"))(df)
    assert(d.columns.toSeq == Seq("c", "c2"))
    assert(d.select("c2").as[String].collect().toSeq == Seq("a", "X"))
  }

  test("ReplaceSubstrings is sequential: later patterns see earlier output") {
    val df = Seq("BRUSHED STEEL").toDF("c")
    val out = ReplaceSubstrings(Seq("c"),
      Seq("BRUSHED" -> "B", "B" -> "X"))(df)
    // BRUSHED->B gives "B STEEL"; then B->X gives "X STEEL"
    assert(out.as[String].collect()(0) == "X STEEL")
  }

  test("ReplaceSubstrings treats patterns as literals, not regex") {
    val df = Seq("a.b").toDF("c")
    val out = ReplaceSubstrings(Seq("c"), Seq("." -> "_"))(df)
    assert(out.as[String].collect()(0) == "a_b")
  }

  test("ReplaceStrings replaces whole values only") {
    val df = Seq("A", "AB").toDF("c")
    val out = ReplaceStrings(Seq("c"), Seq("A" -> "Z"))(df)
    assert(out.as[String].collect().toSeq == Seq("Z", "AB"))
  }

  test("BoolToBinary casts to 0/1") {
    val df = Seq(Some(true), Some(false), None).toDF("c")
    val out = BoolToBinary(Seq("c"))(df).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq == Seq(1, 0, null))
  }

  test("Pipeline composes lazily and tracks each op in history") {
    val ds = GraftDataset(Seq(Some("a"), None).toDF("c"))
    val out = Pipeline(
      FillNA(Seq("c"), "x"),
      ReplaceStrings(Seq("c"), Seq("x" -> "y")))(ds)
    assert(out.data.select("c").as[String].collect().sorted.toSeq ==
      Seq("a", "y"))
    assert(out.history.size == 2)
    assert(out.history.forColumn("c").size == 2)
  }

  test("op refuses unknown column") {
    val ds = GraftDataset(Seq("a").toDF("c"))
    intercept[IllegalArgumentException] {
      FillNA(Seq("nope"), "x")(ds)
    }
  }
}
