package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")
  ).toDF("id", "text")
  private val newSnap = Seq(
    (1L, "alpha"),        // unchanged
    (2L, "bravo EDITED"), // changed
    (4L, "delta"),        // unchanged
    (5L, "echo")          // added; 3 removed
  ).toDF("id", "text")

  test("contentDiff labels added/removed/changed/unchanged") {
    val out = Snapshot.contentDiff(oldSnap, newSnap, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
  }

  test("contentDiffSummary counts all four statuses, absent ones at 0") {
    val s = Snapshot.contentDiffSummary(oldSnap, newSnap, "id",
      Seq("text")).as[(Long, Long, Long, Long)].head()
    assert(s == ((1L, 1L, 1L, 2L))) // added, removed, changed, unchanged
    val none = Snapshot.contentDiffSummary(oldSnap, oldSnap, "id",
      Seq("text")).as[(Long, Long, Long, Long)].head()
    assert(none == ((0L, 0L, 0L, 4L)))
  }

  test("null content: null vs null is unchanged, null vs value is " +
      "changed") {
    val a = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("id", "text")
    val b = Seq((1L, null.asInstanceOf[String]), (2L, "now set"))
      .toDF("id", "text")
    val out = Snapshot.contentDiff(a, b, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("a value MOVING between content columns via nulls is " +
      "'changed' (null positions are part of the fingerprint)") {
    val a = Seq((1L, "x", null.asInstanceOf[String]))
      .toDF("id", "title", "body")
    val b = Seq((1L, null.asInstanceOf[String], "x"))
      .toDF("id", "title", "body")
    val st = Snapshot.contentDiff(a, b, "id", Seq("title", "body"))
      .as[(Long, String)].head()._2
    assert(st == "changed")
    // same null positions on both sides stay unchanged
    val same = Snapshot.contentDiff(a, a, "id", Seq("title", "body"))
      .as[(Long, String)].head()._2
    assert(same == "unchanged")
  }

  test("multi-column fingerprint: change in any listed column flags " +
      "changed; unlisted columns are ignored") {
    val a = Seq((1L, "t", "en", 9L)).toDF("id", "text", "lang", "extra")
    val b1 = Seq((1L, "t", "de", 9L)).toDF("id", "text", "lang", "extra")
    val b2 = Seq((1L, "t", "en", 77L)).toDF("id", "text", "lang", "extra")
    def st(b: org.apache.spark.sql.DataFrame) =
      Snapshot.contentDiff(a, b, "id", Seq("text", "lang"))
        .as[(Long, String)].head()._2
    assert(st(b1) == "changed")
    assert(st(b2) == "unchanged")
  }

  test("plan projects to (id, fingerprint) below the join: no text " +
      "column crosses the exchange") {
    val plan = Snapshot.contentDiff(oldSnap, newSnap, "id", Seq("text"))
      .queryExecution.executedPlan.toString
    // both join inputs are (id, fingerprint) projections — the
    // exchange carries 16 bytes/row, never the content itself (on a
    // local relation the xxhash64 constant-folds into the scan, so
    // the witness is the ABSENCE of the text column anywhere in the
    // executed plan)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!plan.contains("text#"),
      s"text column survived past the fingerprint projection in:\n$plan")
  }
}
