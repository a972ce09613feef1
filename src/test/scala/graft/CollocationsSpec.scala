package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "new york new york", // (new,york)x2 + (york,new)
    "in new york",
    "the the the", // (the,the)x2
    "solo").toDF("text")

  test("collocations: counts, lift, floor, deterministic order") {
    val got = Collocations.collocations(docs, "text", minCount = 2L,
        topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    // unigrams: new 3, york 3, in 1, the 3, solo 1
    // pairs >= 2: (new,york) 3, (the,the) 2
    assert(got.toSeq == Seq(
      ("new", "york", 3L, 3L, 3L, 3.0 * 1e12 / 9.0),
      ("the", "the", 2L, 3L, 3L, 2.0 * 1e12 / 9.0)))
    // the floor pruned the count-1 pairs
    assert(!got.exists(r => r._1 == "york" || r._1 == "in"))
  }

  test("collocations: single-token docs feed unigrams, not pairs") {
    val d2 = Seq("a b", "a b", "a").toDF("text")
    val got = Collocations.collocations(d2, "text", minCount = 2L,
        topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    // c1('a') counts the solo doc: 3, c2('b') = 2
    assert(got.toSeq == Seq(("a", "b", 2L, 3L, 2L, 2.0 * 1e12 / 6.0)))
  }
}
