package graft

import org.apache.spark.sql.functions._
import graft.operators.SegmentDedup

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("removeBoilerplate drops frequent segments from every doc and " +
      "keeps order") {
    val df = Seq(
      (1L, "intro one|FOOTER|body of one"),
      (2L, "FOOTER|intro two|body of two"),
      (3L, "intro three|FOOTER"),
      (4L, "no footer here at all")).toDF("doc_id", "text")
    val out = SegmentDedup
      .removeBoilerplate(df, "doc_id", "text", "|", minDocs = 3L)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "intro one|body of one",
      2L -> "intro two|body of two",
      3L -> "intro three",
      4L -> "no footer here at all"))
  }

  test("removeBoilerplate counts a doc once however often it repeats " +
      "the segment") {
    val df = Seq(
      (1L, "AD|x|AD|y|AD"), // one doc, three repeats: df(AD) = 2
      (2L, "AD|z")).toDF("doc_id", "text")
    // minDocs = 3 > 2 distinct docs -> nothing removed
    val keptAll = SegmentDedup
      .removeBoilerplate(df, "doc_id", "text", "|", minDocs = 3L)
      .as[(Long, String)].collect().toMap
    assert(keptAll(1L) == "AD|x|AD|y|AD") // split+join is the identity
    // minDocs = 2 -> removed everywhere, including the repeats
    val scrubbed = SegmentDedup
      .removeBoilerplate(df, "doc_id", "text", "|", minDocs = 2L)
      .as[(Long, String)].collect().toMap
    assert(scrubbed == Map(1L -> "x|y", 2L -> "z"))
  }

  test("removeBoilerplate reconstructs a fully-scrubbed doc as the " +
      "empty string and treats empty segments uniformly") {
    val df = Seq(
      (1L, "FOOTER"),
      (2L, "FOOTER"),
      (3L, "FOOTER"),
      (4L, "a||b"), // empty middle segment survives (df = 2 < 3)
      (5L, "c||d")).toDF("doc_id", "text")
    val out = SegmentDedup
      .removeBoilerplate(df, "doc_id", "text", "|", minDocs = 3L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out(4L) == "a||b" && out(5L) == "c||d")
  }

  test("dedupSegments keeps only the globally first occurrence, " +
      "including within-doc repeats") {
    val df = Seq(
      (2L, "dup|unique two|dup"), // within-doc repeat of 'dup'
      (1L, "first|dup"), // doc 1 wins 'dup': smaller doc_id
      (3L, "dup|first|tail")).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(df, "doc_id", "text", "|")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "first|dup",
      2L -> "unique two",
      3L -> "tail"))
  }

  test("dedupSegments ties within a doc resolve to the earliest " +
      "position") {
    val df = Seq((1L, "x|x|x|y")).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(df, "doc_id", "text", "|")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "x|y"))
  }

  test("dedupSegments' rank-1 filter compiles to WindowGroupLimit") {
    val df = (1L to 200L)
      .map(i => (i, s"seg${i % 5}|seg${i % 7}"))
      .toDF("doc_id", "text")
    // the window subtree lives behind the reconstruct aggregate; the
    // executed plan must still show the group-limit pushdown, which
    // is what keeps a billion-fold repeated segment from becoming one
    // giant window sort partition
    val plan = SegmentDedup.dedupSegments(df, "doc_id", "text", "|")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("separator characters that are regex metachars are literal") {
    val df = Seq((1L, "a.b|c"), (2L, "a.b|c")).toDF("doc_id", "text")
    // '.' as separator: must split on the DOT only, not on any char
    val out = SegmentDedup.dedupSegments(df, "doc_id", "text", ".")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a.b|c", 2L -> ""))
  }
}
