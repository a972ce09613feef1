package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorStats

/** PCA over embeddings: the gram aggregate (distributed, int-exact),
  * the driver-side Jacobi eigen solve, and the map-only projection.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def naiveGram(vs: Seq[Array[Float]]): Map[(Long, Long), Long] = {
    val qs = vs.map(_.map(x =>
      java.math.BigDecimal.valueOf(x.toDouble * 1000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
    val d = qs.head.length
    (for (i <- 0 until d; j <- i until d) yield
      ((i + 1).toLong, (j + 1).toLong) ->
        qs.map(q => q(i) * q(j)).sum).toMap
  }

  test("gramMatrix matches the naive per-element triangle") {
    val vs = Seq(
      Array(1.0f, -2.0f, 0.5f),
      Array(0.25f, 3.0f, -1.5f),
      Array(-0.75f, 0.125f, 2.0f))
    val out = VectorStats.gramMatrix(vs.map(Tuple1(_)).toDF("v"), "v")
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap
    assert(out == naiveGram(vs))
  }

  test("gramMatrix skips null vectors and is partitioning-invariant") {
    val vs = (1 to 257)
      .map(i => Array.tabulate(6)(j => ((i * 31 + j * 7) % 13 - 6) / 4.0f))
    val rows = vs.map(v => Tuple1(v: Array[Float])) :+
      Tuple1(null.asInstanceOf[Array[Float]])
    val df = rows.toDF("v")
    def run(parts: Int) =
      VectorStats.gramMatrix(df.repartition(parts), "v")
        .as[(Long, Long, Long)].collect().toSet
    val one = run(1)
    assert(one == run(11))
    assert(one.map { case (i, j, s) => (i, j) -> s }.toMap ==
      naiveGram(vs))
  }

  test("gramMatrix fails loudly on ragged vector lengths") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(1.0f)))
      .toDF("v")
    val e = intercept[Exception] {
      VectorStats.gramMatrix(df.coalesce(1), "v").collect()
    }
    assert(e.getMessage.contains("ragged") ||
      e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }

  test("jacobiEigen recovers an analytic 2x2 decomposition") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1, axes (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = VectorStats.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12)
    assert(math.abs(sorted(1) - 1.0) < 1e-12)
    // columns are orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
  }

  test("jacobiEigen satisfies A*v = lambda*v on a random symmetric") {
    val rnd = new scala.util.Random(7)
    val d = 8
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2 - 1
      a(i)(j) = x; a(j)(i) = x
    }
    val (vals, vecs) = VectorStats.jacobiEigen(a)
    for (c <- 0 until d) {
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => a(i)(j) * vecs(j)(c)).sum)
      val res = (0 until d)
        .map(i => math.pow(av(i) - vals(c) * vecs(i)(c), 2)).sum
      assert(math.sqrt(res) < 1e-9, s"residual for eigenpair $c")
    }
  }

  test("pcaFit finds the planted dominant axis; variances descend") {
    // points spread along (3,4)/5 with tiny orthogonal jitter
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val tAxis = rnd.nextGaussian() * 10
      val tJit  = rnd.nextGaussian() * 0.1
      Tuple1(Array((0.6 * tAxis - 0.8 * tJit).toFloat,
        (0.8 * tAxis + 0.6 * tJit).toFloat))
    }
    val model = VectorStats.pcaFit(rows.toDF("v"), "v", 2)
    val w = model.components(0)
    val cos = math.abs(w(0) * 0.6 + w(1) * 0.8) /
      math.sqrt(w(0) * w(0) + w(1) * w(1))
    assert(cos > 0.999, s"component 1 misaligned: ${w.toSeq}")
    assert(model.variance(0) > model.variance(1))
    // canonical sign: largest-|coordinate| is positive
    assert(w.maxBy(math.abs) > 0)
  }

  test("pcaFit is bit-identical across partitionings (int-exact sums)") {
    val rows = (1 to 300).map(i =>
      Tuple1(Array.tabulate(5)(j => ((i * 17 + j * 3) % 19 - 9) / 5.0f)))
    val df = rows.toDF("v")
    val m1 = VectorStats.pcaFit(df.repartition(1), "v", 3)
    val m9 = VectorStats.pcaFit(df.repartition(9), "v", 3)
    assert(m1.mean.toSeq == m9.mean.toSeq)
    assert(m1.variance.toSeq == m9.variance.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ==
      m9.components.map(_.toSeq).toSeq)
  }

  test("pcaProject matches the driver-side reference projection") {
    val vs = Seq(
      Array(1.0f, 2.0f, 3.0f),
      Array(-1.0f, 0.5f, 2.5f),
      Array(4.0f, -2.0f, 0.0f))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val model = VectorStats.pcaFit(df, "v", 2)
    val out = VectorStats.pcaProject(df, "id", "v", model)
      .as[(Long, Double, Double)].collect()
      .map { case (id, p1, p2) => id -> (p1, p2) }.toMap
    for ((v, i) <- vs.zipWithIndex) {
      val exp = model.components.map(w =>
        v.indices.map(j => (v(j) - model.mean(j)) * w(j)).sum)
      val (g1, g2) = out(i.toLong)
      assert(math.abs(g1 - exp(0)) < 1e-6)
      assert(math.abs(g2 - exp(1)) < 1e-6)
    }
  }

  test("end-to-end in-engine embedding pipeline: hashingVector -> " +
      "PCA -> PQ search runs and ranks sanely") {
    import org.apache.spark.sql.functions._
    // corpus with two obvious topic clusters
    val docs = ((0 until 20).map(i => (i.toLong,
        s"spark shuffle partition executor stage task $i")) ++
      (20 until 40).map(i => (i.toLong,
        s"banana apple orange grape melon fruit $i")))
      .toDF("doc_id", "text")
    val emb = docs.select(col("doc_id"),
      graft.functions.TextFunctions.hashingVector(col("text"), 32)
        .cast("array<double>").as("emb"))
    val model = graft.operators.VectorStats
      .pcaFit(emb, "emb", k = 8)
    val proj = graft.operators.VectorStats
      .pcaProjectVec(emb, "doc_id", "emb", model)
    assert(proj.schema("proj").dataType.typeName == "array")
    val cb = graft.operators.ProductQuant
      .pqFit(proj, "doc_id", "proj", m = 2, ksub = 4, iters = 2)
    val hits = graft.operators.ProductQuant
      .pqTopK(proj, proj.filter(col("doc_id") === 0L), "doc_id",
        "proj", cb, k = 5)
      .select("neighbor_id").as[Long].collect()
    // doc 0 is a "spark" doc: its PQ neighbors should be mostly from
    // the spark cluster (ids < 20)
    assert(hits.count(_ < 20L) >= 3,
      s"expected spark-cluster neighbors, got ${hits.toSeq}")
  }

  test("pcaProject is map-only (no shuffle)") {
    val df = (1 to 50).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j) / 10.0f))).toDF("id", "v")
    val model = VectorStats.pcaFit(df, "v", 2)
    val plan = VectorStats.pcaProject(df, "id", "v", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("projection variance concentrates on the leading axis") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      val big = rnd.nextGaussian() * 5
      val sml = rnd.nextGaussian() * 0.5
      (i.toLong, Array(big.toFloat, sml.toFloat,
        (0.3 * big + 0.1 * sml).toFloat))
    }
    val df = rows.toDF("id", "v")
    val model = VectorStats.pcaFit(df, "v", 3)
    val projs = VectorStats.pcaProject(df, "id", "v", model)
      .as[(Long, Double, Double, Double)].collect()
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(projs.map(_._2).toSeq)
    val v2 = variance(projs.map(_._3).toSeq)
    val v3 = variance(projs.map(_._4).toSeq)
    assert(v1 > v2 && v2 >= v3)
    // fitted eigenvalues predict the projection variances
    assert(math.abs(v1 - model.variance(0)) / model.variance(0) < 0.05)
  }
}
