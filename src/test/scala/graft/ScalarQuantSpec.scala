package graft

import org.apache.spark.sql.functions._
import graft.operators.{ScalarQuant, Similarity}

class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("fit finds exact per-dimension milli-unit min/span; " +
      "degenerate dims span 0") {
    val df = vecs(
      (1L, Seq(0.0f, 1.0f, 7.5f)),
      (2L, Seq(2.0f, 1.0f, -2.5f)),
      (3L, Seq(1.0f, 1.0f, 0.0f)))
    val m = ScalarQuant.fit(df, "embedding")
    assert(m.mins.toSeq == Seq(0L, 1000L, -2500L))
    assert(m.spans.toSeq == Seq(2000L, 0L, 10000L))
    // partitioning-invariant
    val m2 = ScalarQuant.fit(df.repartition(5), "embedding")
    assert(m2.mins.toSeq == m.mins.toSeq &&
      m2.spans.toSeq == m.spans.toSeq)
  }

  test("encode: boundary values hit 0 and 255, degenerate dims 0, " +
      "all-integer assignment") {
    val df = vecs(
      (1L, Seq(0.0f, 1.0f, 7.5f)),
      (2L, Seq(2.0f, 1.0f, -2.5f)),
      (3L, Seq(1.0f, 1.0f, 0.0f)))
    val m = ScalarQuant.fit(df, "embedding")
    val got = ScalarQuant.encode(df, "vec_id", "embedding", m)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 0L, 255L))   // min, degenerate, max
    assert(got(2L) == Seq(255L, 0L, 0L))
    // dim3 of doc3: ((0 - (-2500)) * 255) / 10000 = 63 (truncated)
    assert(got(3L) == Seq(127L, 0L, 63L))
    assert(got.values.flatten.forall(c => c >= 0L && c <= 255L))
  }

  test("topK with rerank = corpus recovers the exact cosine top-k") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 60L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val m = ScalarQuant.fit(df, "embedding")
    val queries = df.filter(col("vec_id") <= 2)
    val viaSq = ScalarQuant.topK(df, queries, "vec_id", "embedding",
        m, k = 5, rerank = 60)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id",
        "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSq == exact && viaSq.nonEmpty)
  }

  test("narrow rerank still returns k deterministic rows") {
    val rnd = new scala.util.Random(12)
    val df = (1L to 40L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val m = ScalarQuant.fit(df, "embedding")
    val q = df.filter(col("vec_id") === 1)
    val a = ScalarQuant.topK(df, q, "vec_id", "embedding", m,
        k = 3, rerank = 6)
      .select("neighbor_id").as[Long].collect().toSeq
    val b = ScalarQuant.topK(df.repartition(7), q, "vec_id",
        "embedding", m, k = 3, rerank = 6)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(a == b && a.length == 3)
  }
}
