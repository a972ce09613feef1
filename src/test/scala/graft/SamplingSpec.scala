package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("mixToTarget downsamples to the target recipe, caps at 1.0") {
    import spark.implicits._
    // skewed corpus: a=6000, b=3000, c=1000; recipe 20/30/50 → c is
    // the binding stratum (1000/0.5 = N*=2000): expect ~400/600/1000
    val df = ((1L to 6000L).map(i => (i, "a")) ++
      (6001L to 9000L).map(i => (i, "b")) ++
      (9001L to 10000L).map(i => (i, "c"))).toDF("id", "s")
    val out = graft.operators.Sampling
      .mixToTarget(df, "id", "s", Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
    val kept = out.groupBy("s").count().as[(String, Long)]
      .collect().toMap
    assert(kept("c") == 1000L) // binding stratum keeps everything
    assert(math.abs(kept("a") - 400.0) / 400.0 < 0.15)
    assert(math.abs(kept("b") - 600.0) / 600.0 < 0.15)
    // achieved mix ≈ recipe
    val total = kept.values.sum.toDouble
    assert(math.abs(kept("a") / total - 0.2) < 0.03)
    // untargeted strata are dropped entirely
    val out2 = graft.operators.Sampling
      .mixToTarget(df, "id", "s", Map("a" -> 1.0))
    assert(out2.select("s").distinct().as[String].collect()
      .toSeq == Seq("a"))
    // a target over an absent stratum fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.mixToTarget(df, "id", "s",
        Map("nope" -> 1.0))
    }
  }

  test("weightedSampleByHash keeps ~w fraction per weight level") {
    import spark.implicits._
    val df = (1L to 8000L)
      .map(i => (i, if (i % 2 == 0) 0.9 else 0.1))
      .toDF("id", "w")
    val kept = graft.operators.Sampling
      .weightedSampleByHash(df, "id", "w")
      .groupBy("w").count()
      .as[(Double, Long)].collect().toMap
    assert(math.abs(kept(0.9) / 4000.0 - 0.9) < 0.05)
    assert(math.abs(kept(0.1) / 4000.0 - 0.1) < 0.05)
    // weights outside [0,1] clamp instead of misbehaving
    val clamped = graft.operators.Sampling
      .weightedSampleByHash(
        Seq((1L, 7.0), (2L, -3.0)).toDF("id", "w"), "id", "w")
      .as[(Long, Double)].collect().toSeq
    assert(clamped == Seq((1L, 7.0))) // w>=1 always kept, w<=0 never
  }
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

  test("stratifiedSampleByHash applies per-stratum fractions") {
    val df = ids.withColumn("g",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratifiedSampleByHash(df, "id", "g",
      Map("a" -> 1.0, "b" -> 0.2))
    val counts = out.groupBy("g").count()
      .as[(String, Long)].collect().toMap
    assert(counts("a") == 1000L) // fraction 1.0 keeps everything
    assert(math.abs(counts.getOrElse("b", 0L) / 1000.0 - 0.2) < 0.05)
    // membership is the same rows sampleByHash(0.2) would keep
    val direct = Sampling.sampleByHash(
      df.filter(col("g") === "b"), "id", 0.2).as[(Long, String)]
      .collect().map(_._1).toSet
    val strat = out.filter(col("g") === "b").as[(Long, String)]
      .collect().map(_._1).toSet
    assert(strat == direct)
  }

  test("stratifiedSampleByHash default drops unlisted strata at 0.0") {
    val df = ids.withColumn("g", lit("zzz"))
    assert(Sampling.stratifiedSampleByHash(df, "id", "g",
      Map("a" -> 1.0)).isEmpty)
  }

  test("topKPerGroup keeps exactly k best with deterministic ties") {
    val df = Seq(
      (1L, "g1", 10L), (2L, "g1", 30L), (3L, "g1", 30L),
      (4L, "g1", 5L), (5L, "g2", 7L)).toDF("id", "g", "score")
    val out = Sampling.topKPerGroup(df, "g", "score", "id", 2)
      .as[(Long, String, Long)].collect().toSet
    // g1 ties at 30 resolve to the smaller id first
    assert(out == Set((2L, "g1", 30L), (3L, "g1", 30L), (5L, "g2", 7L)))
  }

  test("topKPerGroup rank filter compiles to WindowGroupLimit") {
    val df = ids.withColumn("g", (col("id") % 7).cast("string"))
      .withColumn("score", col("id") * 13 % 101)
    val plan = Sampling.topKPerGroup(df, "g", "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("leakageSafeSplit keeps near-dup clusters in one split") {
    import graft.operators.Dedup
    val docs = (0L until 900L).toDF("id")
    // 300 clusters of 3 consecutive ids, linked as chains
    val pairs = (0L until 900L by 3)
      .flatMap(b => Seq((b, b + 1), (b + 1, b + 2)))
      .toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "id", pairs,
        Seq("train" -> 0.8, "test" -> 0.2))
      .as[(Long, String)].collect().toMap
    assert(out.size == 900)
    // every member agrees with its cluster representative
    (0L until 900L).foreach { id =>
      assert(out(id) == out(id / 3 * 3), s"leak at id $id")
    }
    // both splits are actually populated
    assert(out.values.toSet == Set("train", "test"))
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

  test("temperatureMix flattens toward small sources at α=1/2 and is " +
      "proportional at α=1") {
    import spark.implicits._
    // big source: 900 docs of 10 tokens; small: 100 docs of 10
    val df = spark.range(1000L).select(col("id"),
      when(col("id") < 900, lit("big")).otherwise(lit("small"))
        .as("src"),
      lit(10L).as("tok"))
    def keptMass(alphaQ: Int): Map[String, Long] =
      Sampling.temperatureMix(df, "id", "tok", "src",
          totalBudget = 2000L, alphaQuarters = alphaQ)
        .groupBy("src").agg(sum("tok").cast("long").as("m"))
        .as[(String, Long)].collect().toMap
    val prop = keptMass(4)
    // α=1: budgets proportional to mass (9:1) → small's budget is
    // exactly 200 tokens = 20 docs (10-token docs divide it evenly)
    assert(prop("small") == 200L)
    val flat = keptMass(2)
    // α=1/2: weights 3:1 → small's budget = 2000/4 = 500
    assert(flat("small") == 500L)
    assert(flat("small") > prop("small"))
    // total stays within budget (+ at most one doc of boundary spill
    // per source — the prefix rule keeps the doc that CROSSES the
    // budget line)
    assert(prop.values.sum <= 2010L && flat.values.sum <= 2010L)
  }

  test("temperatureMix is deterministic across partitionings and " +
      "rejects bad α") {
    import spark.implicits._
    val df = spark.range(300L).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("src"),
      (col("id") % 7 + 1).cast("long").as("tok"))
    def ids(parts: Int) =
      Sampling.temperatureMix(df.repartition(parts), "id", "tok",
        "src", totalBudget = 100L)
        .select("id").as[Long].collect().toSet
    assert(ids(1) == ids(7))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "id", "tok", "src", 100L,
        alphaQuarters = 5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "id", "tok", "src", 0L)
    }
  }
}
