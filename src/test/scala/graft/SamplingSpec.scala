package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hashScore is uniform-ish on [0,1)") {
    val s = ids.select(Sampling.hashScore(col("id")).as("s"))
      .as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x < 1.0))
    assert(math.abs(s.count(_ < 0.5).toDouble / s.length - 0.5) < 0.05)
  }

  test("sampleByHash keeps ~fraction, deterministically") {
    val a = Sampling.sampleByHash(ids, "id", 0.3)
      .as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids.repartition(13), "id", 0.3)
      .as[Long].collect().toSet
    assert(a == b) // same rows on any partitioning
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("deterministicSplit covers every row with stable proportions") {
    val out = Sampling.deterministicSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.03)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.03)
  }

  test("corpus growth never reassigns an existing row") {
    val small = Sampling.deterministicSplit(ids.limit(500), "id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val big = Sampling.deterministicSplit(ids, "id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => big(id) == s })
  }

  test("weights are normalized; non-positive weights rejected") {
    val out = Sampling.deterministicSplit(ids, "id",
      Seq("a" -> 8.0, "b" -> 2.0)) // same as .8/.2
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") / 2000.0 - 0.8) < 0.05)
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(ids, "id", Seq("a" -> 0.0))
    }
  }
}
