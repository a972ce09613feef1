package graft

import org.apache.spark.sql.functions._
import graft.core.GraftDataset
import graft.operators._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ds = GraftDataset(Seq(
    (1L, "write to me at a.b@example.org today please do not wait"),
    (2L, "zz zz zz zz zz zz")).toDF("id", "text"))

  test("curation ops run through GraftDataset and track history") {
    val out = Pipeline(
      RedactPii(Seq("text")),
      AnnotateQuality(Seq("text")),
      AssignSplit(Seq("id"), Seq("train" -> 0.9, "test" -> 0.1)))(ds)
    assert(out.history.size == 3)
    assert(out.history.forColumn("text").size == 2)
    assert(out.history.derivedColumnsFrom("id") == Vector("split"))
    val rows = out.data.orderBy("id")
      .select("text", "text_keep", "text_reasons", "split")
      .as[(String, Boolean, String, String)].collect()
    assert(rows(0)._1.contains("<EMAIL>"))
    assert(rows(0)._2) // clean text passes
    assert(!rows(1)._2 && rows(1)._3.nonEmpty)
    assert(Set("train", "test").contains(rows(0)._4))
  }

  test("curation ops have value equality and survive persistence") {
    assert(RedactPii(Seq("text")) == RedactPii(Seq("text")))
    assert(AssignSplit(Seq("id"), Seq("a" -> 1.0)) !=
      AssignSplit(Seq("id"), Seq("a" -> 0.5)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cur").toString + "/ds"
    val applied = RedactPii(Seq("text"))(ds)
    graft.sources.Io.writeDataset(applied, dir)
    val back = graft.sources.Io
      .readDataset(spark, dir, trusted = true)
    assert(back.history.size == 1)
    assert(back.history(0) == RedactPii(Seq("text")))
  }
}
