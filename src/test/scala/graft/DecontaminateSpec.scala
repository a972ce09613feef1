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

  // ---- semantic (embedding-space) decontamination ----

  private def vdf(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  test("semanticOverlap: max cosine, argmax id, threshold flag") {
    val train = vdf(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(0.6f, 0.8f, 0f)))
    val ev = vdf(
      (100L, Seq(2f, 0f, 0f)),   // exact direction of train 1 → 1.0
      (101L, Seq(0f, 0f, 1f)))   // orthogonal to everything → 0.0
    val out = Decontaminate.semanticOverlap(train, "id", ev, "id",
        "vec", threshold = 0.9)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(100L) == ((1L, 1.0, true)))
    assert(out(101L)._1 == 1L) // all cosines 0.0 → smallest train id
    assert(out(101L)._2 == 0.0 && !out(101L)._3)
  }

  test("semanticOverlap ties break to the smallest train id") {
    val train = vdf(
      (7L, Seq(1f, 0f)), (4L, Seq(2f, 0f)), (9L, Seq(3f, 0f)))
    val ev = vdf((100L, Seq(5f, 0f)))
    val out = Decontaminate.semanticOverlap(train, "id", ev, "id",
      "vec", 0.5).as[(Long, Long, Double, Boolean)].collect()
    assert(out.toSeq == Seq((100L, 4L, 1.0, true)))
  }

  test("semanticOverlap excludes zero-norm vectors on both sides") {
    val train = vdf((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)))
    val ev = vdf((100L, Seq(0f, 0f)), (101L, Seq(1f, 1f)))
    val out = Decontaminate.semanticOverlap(train, "id", ev, "id",
      "vec", 0.9).as[(Long, Long, Double, Boolean)].collect()
    // eval 100 (zero-norm) yields no row; train 1 never scores
    assert(out.map(_._1).toSeq == Seq(101L))
    assert(out.head._2 == 2L)
  }

  test("semanticScrubTrain drops exactly the >=-threshold rows and " +
      "keeps zero-norm rows") {
    val train = vdf(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(0f, 0f, 0f)), // zero-norm: unscoreable, must survive
      (4L, Seq(0.7f, 0.7f, 0f))) // cosine ≈ 0.707: below threshold
    val ev = vdf((100L, Seq(1f, 0f, 0f)))
    val kept = Decontaminate.semanticScrubTrain(train, "id", ev, "id",
        "vec", threshold = 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("semanticOverlap plan: eval broadcast, train never shuffles " +
      "before the |eval|-sized aggregation") {
    val train = vdf((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val ev = vdf((100L, Seq(1f, 1f)))
    val plan = Decontaminate.semanticOverlap(train, "id", ev, "id",
      "vec", 0.5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast nested-loop join in:\n$plan")
    // partial aggregation must sit UNDER the exchange (map-side fold
    // to |eval| rows): a partial_max below the first Exchange line
    // (struct-max forces SortAggregate — still partial-merged)
    val lines = plan.linesIterator.toVector
    val ex = lines.indexWhere(_.contains("Exchange"))
    val aggBelow = lines.drop(ex + 1)
      .exists(_.contains("partial_max"))
    assert(ex >= 0 && aggBelow,
      s"expected a map-side partial aggregate below the exchange " +
      s"in:\n$plan")
  }
}
