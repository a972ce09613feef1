package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1L, "what is the capital city of france exactly"),
    (2L, "solve for x in the quadratic equation below")).toDF("q", "t")

  test("flags docs containing a benchmark n-gram, counts distinct hits") {
    val corpus = Seq(
      (10L, "discussion about the capital city of france and its food"),
      (11L, "a totally unrelated text about cooking pasta at home"),
      (12L, "the capital city of france appears twice here: " +
        "the capital city of france")).toDF("doc_id", "text")
    val flagged = Decontaminate.flagContaminated(corpus, "doc_id",
        "text", bench, "t", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(flagged.contains(10L))
    assert(!flagged.contains(11L))
    // doc 12 repeats the gram but hits count DISTINCT shared grams
    assert(flagged(12L) == flagged(10L))
  }

  test("removeContaminated drops flagged docs and keeps the rest") {
    val corpus = Seq(
      (10L, "what is the capital city of france exactly"),
      (11L, "clean document with its own unique words only")
    ).toDF("doc_id", "text")
    val out = Decontaminate.removeContaminated(corpus, "doc_id",
      "text", bench, "t", n = 4).as[(Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(11L))
  }

  test("bloom prefilter returns exactly the plain path's result") {
    val corpus = Seq(
      (10L, "discussion about the capital city of france and its food"),
      (11L, "a totally unrelated text about cooking pasta at home"),
      (12L, "solve for x in the quadratic equation below if you can"),
      (13L, "nothing shared with any benchmark item whatsoever here")
    ).toDF("doc_id", "text")
    val plain = Decontaminate.flagContaminated(corpus, "doc_id",
      "text", bench, "t", n = 4).as[(Long, Long)].collect().toMap
    val bloomed = Decontaminate.flagContaminatedBloom(corpus, "doc_id",
      "text", bench, "t", n = 4).as[(Long, Long)].collect().toMap
    assert(bloomed == plain)
    // an UNDERSIZED filter (64 expected items, 30% fpp) inflates the
    // false-positive rate but the exact verify join keeps the result
    // identical — correctness never depends on the filter's sizing
    val tiny = Decontaminate.flagContaminatedBloom(corpus, "doc_id",
        "text", bench, "t", n = 4, expectedGrams = 64L, fpp = 0.3)
      .as[(Long, Long)].collect().toMap
    assert(tiny == plain)
    val removedPlain = Decontaminate.removeContaminated(corpus,
      "doc_id", "text", bench, "t", n = 4).as[(Long, String)]
      .collect().map(_._1).toSet
    val removedBloom = Decontaminate.removeContaminatedBloom(corpus,
      "doc_id", "text", bench, "t", n = 4).as[(Long, String)]
      .collect().map(_._1).toSet
    assert(removedBloom == removedPlain)
  }

  test("bloom prefilter runs below every exchange (map-side)") {
    val corpus = Seq((10L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Decontaminate.flagContaminatedBloom(corpus, "doc_id",
        "text", bench, "t", n = 4)
      .queryExecution.executedPlan.toString
    val probe = plan.linesIterator.indexWhere(
      _.contains("might_contain"))
    val firstExchange = plan.linesIterator.indexWhere(
      _.contains("Exchange"))
    assert(probe >= 0, s"expected might_contain in:\n$plan")
    // plan trees print top-down: the probe filter must appear BELOW
    // (after) every exchange line, i.e. on the scan side
    assert(firstExchange < 0 || probe > firstExchange,
      s"bloom probe above an exchange in:\n$plan")
  }

  test("corpus side joins without shuffling its grams") {
    val corpus = Seq((10L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Decontaminate.flagContaminated(corpus, "doc_id",
        "text", bench, "t", n = 4)
      .queryExecution.executedPlan.toString
    // the only exchanges allowed: bench-side broadcast + the final
    // (id, count) aggregation; the corpus gram explosion must feed the
    // join directly
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
