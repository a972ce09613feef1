package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "quantum flux capacitor design notes and measurements"),
    (2L, "cooking pasta with garlic and olive oil at home"),
    (3L, "the quantum capacitor flux paper quantum quantum"),
    (4L, "garlic garlic garlic garlic garlic garlic garlic"),
    (5L, "unrelated text about medieval castle architecture")
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Long, String)], k: Int = 10) =
    Retrieval.bm25TopK(corpus, "doc_id", "text",
      qs.toDF("query_id", "qtext"), "query_id", "qtext", k)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap

  test("docs sharing no query term are unscored; matches rank by " +
      "shared-term weight") {
    val out = run(Seq((100L, "quantum capacitor")))
    val ranked = out(100L).map(_._2)
    // only docs 1 and 3 contain the terms; 5/2/4 absent
    assert(ranked.toSet == Set(1L, 3L))
  }

  test("rare terms dominate common ones (rational idf)") {
    // "capacitor" appears in 2 docs, "garlic" in 2 docs, but query
    // pairs a rare term against a common one within one query:
    // "medieval" (df=1) vs "and" (df=2) — doc 5 (rare hit) must beat
    // docs 1 and 2 (common hit)
    val out = run(Seq((100L, "medieval and")))
    assert(out(100L).head._2 == 5L)
  }

  test("tf saturates: a term repeated 7x cannot beat two distinct " +
      "shared terms of similar rarity") {
    // query "garlic oil": doc 2 shares BOTH terms once; doc 4 shares
    // one term 7 times. k1=1.2 caps the repeated term's weight at
    // (k1+1)x a single occurrence, so doc 2 wins.
    val out = run(Seq((100L, "garlic oil")))
    assert(out(100L).head._2 == 2L)
  }

  test("ties break to the smallest doc id and ranks are 1-based " +
      "dense positions") {
    val twin = Seq(
      (7L, "alpha beta"), (3L, "alpha beta"), (9L, "other words")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(twin, "doc_id", "text",
        Seq((1L, "alpha beta")).toDF("query_id", "qtext"),
        "query_id", "qtext", k = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(3L, 7L)) // identical docs: id order
    assert(out.map(_._4).toSeq == Seq(1L, 2L))
    assert(out(0)._3 == out(1)._3) // identical scores
  }

  test("k truncates per query; duplicate query terms count once") {
    val out1 = run(Seq((100L, "quantum")), k = 1)
    assert(out1(100L).length == 1)
    val a = run(Seq((100L, "quantum")))
    val b = run(Seq((100L, "quantum quantum quantum")))
    assert(a(100L).toSeq == b(100L).toSeq)
  }

  test("scores are partition-invariant (exact integers)") {
    val qs = Seq((100L, "quantum capacitor"), (101L, "garlic oil"))
    def runParts(parts: Int) =
      Retrieval.bm25TopK(corpus.repartition(parts), "doc_id", "text",
        qs.toDF("query_id", "qtext").repartition(parts),
        "query_id", "qtext", 10)
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(runParts(1) == runParts(7))
  }

  test("plan prunes corpus tokens against the broadcast query " +
      "vocabulary before any aggregation exchange") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq((1L, "quantum")).toDF("query_id", "qtext"),
        "query_id", "qtext", 10)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val firstExchange = lines.indexWhere(_.contains("Exchange"))
    val lastBroadcastJoin =
      lines.lastIndexWhere(_.contains("BroadcastHashJoin"))
    assert(lastBroadcastJoin >= 0, s"no broadcast join in:\n$plan")
    // plans print top-down: a broadcast prune join below the first
    // exchange means tokens are filtered before any shuffle
    assert(firstExchange >= 0)
    assert(lastBroadcastJoin > firstExchange,
      s"vocab prune not below the first exchange in:\n$plan")
  }
}
