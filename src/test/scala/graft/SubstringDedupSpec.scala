package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "all rights reserved contact us for terms"

  test("repeatedSpanStats flags cross-doc verbatim spans only") {
    val df = Seq(
      (1L, s"alpha beta gamma $boiler tail one"),
      (2L, s"$boiler something entirely different here"),
      (3L, "no shared content in this document at all ok")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .repeatedSpanStats(df, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the 7-token boiler contributes 4 repeated 4-grams in each doc
    assert(out(1L)._3 == 4 && out(2L)._3 == 4)
    assert(out(3L)._3 == 0L && out(3L)._4 == 0.0)
    // n_grams = tokens - 3 (doc 1 has 12 tokens)
    assert(out(1L)._2 == 12L - 3L)
    assert(out(1L)._4 == 4.0 / 9.0)
  }

  test("removeRepeatedSpans keeps the smallest-id copy, scrubs the rest") {
    val df = Seq(
      (1L, s"alpha beta gamma $boiler tail one"),
      (2L, s"$boiler something entirely different here"),
      (3L, "no shared content in this document at all ok")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .removeRepeatedSpans(df, "doc_id", "text", n = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is the keeper: untouched
    assert(out(1L)._2 == s"alpha beta gamma $boiler tail one")
    assert(out(1L)._4 == 0L)
    // doc 2 loses exactly the 7 boiler tokens
    assert(out(2L)._2 == "something entirely different here")
    assert(out(2L)._3 == 4L && out(2L)._4 == 7L)
    assert(out(3L)._4 == 0L)
  }

  test("a doc repeated verbatim is fully scrubbed in the non-keeper") {
    val df = Seq(
      (10L, "one two three four five six seven eight"),
      (20L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .removeRepeatedSpans(df, "doc_id", "text", n = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L)._2.nonEmpty && out(10L)._4 == 0L)
    assert(out(20L)._2 == "" && out(20L)._3 == 0L && out(20L)._4 == 8L)
  }

  test("within-doc repetition alone does not trigger (minDocs=2)") {
    val df = Seq(
      (1L, s"$boiler $boiler $boiler"),
      (2L, "totally unrelated text with enough tokens here")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .repeatedSpanStats(df, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 0L) // repeats live in ONE doc only
  }

  test("short and null docs survive with zero accounting") {
    val df = Seq((1L, Some("tiny")), (2L, None),
        (3L, Some("tiny")))
      .toDF("doc_id", "text")
    val out = SubstringDedup
      .removeRepeatedSpans(df, "doc_id", "text", n = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // "tiny" is a single truncated gram shared by docs 1 and 3:
    // doc 1 keeps it, doc 3 is scrubbed
    assert(out(1L)._2 == "tiny")
    assert(out(3L)._2 == "" && out(3L)._4 == 1L)
    assert(out(2L)._2 == "" && out(2L)._3 == 0L && out(2L)._4 == 0L)
  }

  test("stats are partitioning-invariant") {
    val docs = (1L to 40L).map { i =>
      val base = (0 until 12).map(j => s"w${(i * 3 + j) % 11}")
        .mkString(" ")
      (i, if (i % 4 == 0) s"$base $boiler" else base)
    }
    def run(parts: Int) = SubstringDedup
      .repeatedSpanStats(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(run(1) == run(13))
  }
}
