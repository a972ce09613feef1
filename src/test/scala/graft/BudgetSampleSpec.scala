package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class BudgetSampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "web", 10L), (2L, "web", 10L), (3L, "web", 10L),
    (4L, "web", 10L), (5L, "web", 10L),
    (6L, "code", 100L), (7L, "code", 100L),
    (8L, "books", 7L)
  ).toDF("doc_id", "source", "tok")

  // hash-priority order within a source, same formula as the engine
  private def priority(ids: Seq[Long]): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def score(id: Long): String = md.digest(
      id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    ids.sortBy(id => (score(id), id))
  }

  test("budget admits in hash order; the crossing doc is included") {
    val kept = Sampling.budgetSample(docs, "doc_id", "tok", "source",
        Map("web" -> 25L))
      .select("doc_id").as[Long].collect().toSet
    // 25 tokens of 10-token docs: docs 1-2 fill 20 < 25, the third
    // crosses the line and is admitted; the fourth sees excl=30 >= 25
    val want = priority(1L to 5L).take(3).toSet
    assert(kept == want)
  }

  test("sources without a budget are dropped; big budget keeps all") {
    val kept = Sampling.budgetSample(docs, "doc_id", "tok", "source",
        Map("code" -> 1000000L))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(6L, 7L))
  }

  test("budget 1 keeps exactly the first-priority doc; 0 keeps none") {
    val one = Sampling.budgetSample(docs, "doc_id", "tok", "source",
        Map("web" -> 1L)).select("doc_id").as[Long].collect().toSeq
    assert(one == Seq(priority(1L to 5L).head))
    val none = Sampling.budgetSample(docs, "doc_id", "tok", "source",
      Map("web" -> 0L))
    assert(none.count() == 0L)
  }

  test("deterministic across partitionings; full row comes back") {
    def run(parts: Int) = Sampling.budgetSample(
        docs.repartition(parts), "doc_id", "tok", "source",
        Map("web" -> 25L, "code" -> 100L, "books" -> 7L))
      .as[(Long, String, Long)].collect().toSet
    val r1 = run(1)
    assert(r1 == run(8))
    assert(r1.map(_._2) == Set("web", "code", "books"))
  }

  test("one giant source: range exchange, no per-source window") {
    val big = spark.range(5000L).select(col("id").as("doc_id"),
      lit("web").as("source"), lit(3L).as("tok"))
    val out = Sampling.budgetSample(big, "doc_id", "tok", "source",
      Map("web" -> 601L))
    // 601 tokens of 3-token docs: 200 fill 600 < 601, doc 201 crosses
    assert(out.count() == 201L)
    // the prefix work ran inside the localCheckpointed stage, so the
    // final plan can't show the range exchange — but it CAN prove no
    // per-source window partition exists anywhere downstream
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }
}
