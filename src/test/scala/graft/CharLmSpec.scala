package graft

import org.apache.spark.sql.functions._
import graft.operators.CharLm

class CharLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "abab"),
    (2L, "abc"),
    (3L, "x"),       // too short: scores null
    (4L, null: String))
    .toDF("doc_id", "text")

  test("fit counts bigrams, prefix totals and vocab exactly") {
    val m = CharLm.fit(corpus, "text")
    // "abab" -> ab, ba, ab ; "abc" -> ab, bc
    assert(m.bigram == Map("ab" -> 3L, "ba" -> 1L, "bc" -> 1L))
    assert(m.prevTot == Map("a" -> 3L, "b" -> 2L))
    // next-chars {a, b, c} + unseen bucket
    assert(m.vocab == 4L)
  }

  test("score is the exact integer micro-probability sum; nulls for " +
      "short docs; unseen bigrams hit the smoothing floor") {
    val m = CharLm.fit(corpus, "text")
    def mp(cnt: Long, tot: Long): Long =
      ((cnt + 1L) * 1000000000L) / (tot + m.vocab)
    val got = CharLm.score(corpus, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(got(1L).contains((3L,
      mp(3, 3) + mp(1, 2) + mp(3, 3))))      // ab ba ab
    assert(got(2L).contains((2L, mp(3, 3) + mp(1, 2)))) // ab bc
    assert(got(3L).isEmpty && got(4L).isEmpty)

    // a doc the model never saw: every position smoothing-floored
    val other = Seq((9L, "zz")).toDF("doc_id", "text")
    val o = CharLm.score(other, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().head
    assert(o == ((9L, 1L, mp(0, 0))))
  }

  test("score is map-only and partitioning-invariant") {
    val m = CharLm.fit(corpus, "text")
    val plan = CharLm.score(corpus, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score shuffles:\n$plan")
    val a = CharLm.score(corpus, "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    val b = CharLm.score(corpus.repartition(7), "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("supplementary (astral) characters count as single positions") {
    // U+1F600 is a surrogate pair in UTF-16: code-point iteration
    // must see "😀a" as ONE bigram, like SQL substring would
    val df = Seq((1L, "😀a")).toDF("doc_id", "text")
    val m = CharLm.fit(df, "text")
    assert(m.bigram.keys.toSet == Set("😀a"))
    val s = CharLm.score(df, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().head
    assert(s._2 == 1L)
  }
}
