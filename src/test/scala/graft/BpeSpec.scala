package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String, merges: Seq[(String, String)])
      : Seq[String] = Bpe.encodeText(text, merges).toSeq

  test("greedy left-to-right merging, chained merges, counts") {
    // overlap: greedy pairs left-to-right, merged tokens never
    // re-merge within their own rank
    assert(toks("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(toks("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(toks("aaaaa", Seq(("a", "a"))) == Seq("aa", "aa", "a"))
    // chained ranks build multi-char tokens
    assert(toks("the", Seq(("t", "h"), ("th", "e"))) == Seq("the"))
    // untouched symbols stay single chars
    assert(toks("cat", Seq(("t", "h"))) == Seq("c", "a", "t"))
    val counted = Bpe.encode(Seq((1L, "the the"))
        .toDF("id", "text"), "text",
        Seq(("t", "h"), ("th", "e"), ("the", " ")))
      .select("n_tokens").as[Long].collect().head
    // "the " + "the" after three merges
    assert(counted == 2L)
  }

  test("later ranks see earlier merges but not vice versa") {
    // (a,b) then (ab,c): "abc" -> [ab, c] -> [abc]
    assert(toks("abc", Seq(("a", "b"), ("ab", "c"))) == Seq("abc"))
    // reversed rank order: (ab,c) sees only single chars -> no-op
    assert(toks("abc", Seq(("ab", "c"), ("a", "b"))) ==
      Seq("ab", "c"))
  }

  test("empty, null and separator-polluted inputs") {
    val df = Seq((1L, ""), (2L, "a" + Bpe.Sep + "b"),
      (3L, null: String)).toDF("id", "text")
    val got = Bpe.encode(df, "text", Seq(("a", "b")))
      .select("id", "token_stream", "n_tokens")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("", 0L)))
    assert(got(2L) == (("ab", 1L))) // sep scrubbed, then merged
    assert(got(3L) == (("", 0L)))
  }

  test("encode is one shuffle-free pass") {
    val df = Seq((1L, "the cat")).toDF("id", "text")
    val plan = Bpe.encode(df, "text",
      Seq(("t", "h"), ("th", "e"))).queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"))
    assert(plan.toString.contains("MapPartitions"))
  }

  test("chunk windows tokens and reassembles text exactly") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq((1L, "the the cat"), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
    val got = Bpe.chunk(df, "doc_id", "text", merges, maxTokens = 3)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Long)].collect().toSet
    // doc 1 tokens: [the, ' ', the, ' ', c, a, t] -> windows of 3
    assert(got == Set(
      (1L, 0, "the the", 3L),
      (1L, 1, " ca", 3L),
      (1L, 2, "t", 1L),
      (3L, 0, "ab", 2L))) // doc 2 (empty) produces no rows
    // chunks partition the document verbatim
    val whole = got.toSeq.filter(_._1 == 1L).sortBy(_._2)
      .map(_._3).mkString("")
    assert(whole == "the the cat")
  }

  test("chunkOverlap: strided windows share context; stride == " +
      "maxTokens degenerates to chunk") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq((1L, "the the cat"), (2L, ""))
      .toDF("doc_id", "text")
    // doc 1 tokens: [the, ' ', the, ' ', c, a, t] (7 tokens)
    val got = Bpe.chunkOverlap(df, "doc_id", "text", merges,
        maxTokens = 4, stride = 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens",
        "start_token")
      .as[(Long, Int, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, "the the ", 4L, 0L),
      (1L, 1, "the ca", 4L, 2L),
      (1L, 2, "cat", 3L, 4L),
      (1L, 3, "t", 1L, 6L))) // empty doc 2: no rows
    // consecutive windows share maxTokens - stride = 2 tokens
    val w0 = "the the "; val w1 = "the ca"
    assert(w0.endsWith("the ") && w1.startsWith("the "))
    // degenerate stride: identical to chunk (modulo start_token)
    val degen = Bpe.chunkOverlap(df, "doc_id", "text", merges, 3, 3)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Long)].collect().toSet
    val plain = Bpe.chunk(df, "doc_id", "text", merges, 3)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(degen == plain)
    intercept[IllegalArgumentException] {
      Bpe.chunkOverlap(df, "doc_id", "text", merges, 3, 4)
    }
  }

  test("train recovers planted merges deterministically") {
    val corpus = Seq.fill(8)("ababab").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 2)
    // round 1: (a,b) 24 beats (b,a) 16; round 2: (ab,ab) 16
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    // partitioning-invariant
    assert(Bpe.train(corpus.repartition(5), "text", 2) == merges)
    // minCount stops the loop on a tiny corpus
    assert(Bpe.train(Seq((1L, "xy")).toDF("id", "text"), "text",
      numMerges = 3) == Seq.empty)
  }
}
