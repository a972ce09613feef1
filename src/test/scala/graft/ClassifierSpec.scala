package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable: class by sign of (x1 + x2 - 1), margin 0.4
  private def separable(n: Int) = (0 until n).map { i =>
    val r1 = ((i * 37) % 97) / 97.0
    val r2 = ((i * 61) % 89) / 89.0
    val y  = if (r1 + r2 > 1.0) 1.0 else 0.0
    val shift = if (y == 1.0) 0.2 else -0.2
    (i.toLong, Seq(r1 + shift, r2 + shift), y)
  }

  test("lrFit separates a separable corpus and lrPredict scores it") {
    val df = separable(400).toDF("id", "x", "y")
    val m = Classifier.lrFit(df, "x", "y", iters = 40,
      learningRate = 1.0)
    val scored = Classifier.lrPredict(df, "x", m)
      .select(col("y"), col("predicted")).as[(Double, Int)].collect()
    val acc = scored.count { case (y, p) => y.toInt == p }.toDouble /
      scored.length
    assert(acc >= 0.97, s"accuracy $acc")
    // the learned boundary leans on both features positively
    assert(m.weights.forall(_ > 0))
  }

  test("fit is bit-identical across partitionings") {
    val df = separable(300).toDF("id", "x", "y")
    val a = Classifier.lrFit(df.repartition(1), "x", "y", iters = 7)
    val b = Classifier.lrFit(df.repartition(13), "x", "y", iters = 7)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
  }

  test("training loss decreases over iterations") {
    val df = separable(300).toDF("id", "x", "y")
    def loss(m: Classifier.LrModel): Double = {
      val rows = Classifier.lrPredict(df, "x", m)
        .select(col("y"), col("score")).as[(Double, Double)].collect()
      -rows.map { case (y, p) =>
        val pc = math.min(math.max(p, 1e-12), 1 - 1e-12)
        y * math.log(pc) + (1 - y) * math.log(1 - pc)
      }.sum / rows.length
    }
    val m1  = Classifier.lrFit(df, "x", "y", iters = 1)
    val m20 = Classifier.lrFit(df, "x", "y", iters = 20)
    assert(loss(m20) < loss(m1), s"${loss(m20)} !< ${loss(m1)}")
  }

  test("l2 shrinks weights toward zero") {
    val df = separable(300).toDF("id", "x", "y")
    val free = Classifier.lrFit(df, "x", "y", iters = 15)
    val reg  = Classifier.lrFit(df, "x", "y", iters = 15, l2 = 0.5)
    assert(reg.weights.map(math.abs).sum <
      free.weights.map(math.abs).sum)
  }

  test("non-0/1 labels and null rows: rejected / dropped") {
    val bad = Seq((Seq(1.0), 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Classifier.lrFit(bad, "x", "y", iters = 1)
    }
    val withNulls = Seq(
      (Some(Seq(1.0, 0.0)), Some(1.0)),
      (None: Option[Seq[Double]], Some(0.0)),
      (Some(Seq(0.0, 1.0)), None: Option[Double]),
      (Some(Seq(0.0, 0.1)), Some(0.0))).toDF("x", "y")
    val m = Classifier.lrFit(withNulls, "x", "y", iters = 2)
    assert(m.dim == 2) // fit ran on the two clean rows
  }

  test("thresholdMetrics: exact confusion counts, undefined " +
      "precision -> null, null rows drop") {
    val df = Seq(
      (0.9, Some(1.0)), (0.8, Some(0.0)), (0.6, Some(1.0)),
      (0.4, Some(0.0)), (0.2, Some(1.0)), (0.1, Some(0.0)),
      (0.5, None: Option[Double])).toDF("score", "label")
    val got = Classifier.thresholdMetrics(df, "score", "label",
        Seq(0.5, 0.99)).collect()
      .map(r => r.getDouble(0) -> r).toMap
    val at05 = got(0.5)
    assert((at05.getLong(1), at05.getLong(2), at05.getLong(3),
      at05.getLong(4)) == ((2L, 1L, 1L, 2L))) // tp fp fn tn
    assert(at05.getDouble(5) == 2.0 / 3 && at05.getDouble(6) == 2.0 / 3)
    val at99 = got(0.99)
    assert(at99.getLong(1) == 0L && at99.isNullAt(5)) // no preds
    assert(at99.getDouble(6) == 0.0) // recall defined: 0/3... 0/(0+3)
  }

  test("in-engine pipeline: rule-labeled seed -> hashingVector " +
      "features -> fit -> corpus scoring recovers the rule") {
    val docs = ((0 until 60).map(i => (i.toLong,
        s"the quick brown fox document number $i reads cleanly")) ++
      (60 until 120).map(i => (i.toLong,
        s"zz zz zz zz spam spam zz $i"))).toDF("doc_id", "text")
    val labeled = docs.withColumn("y",
        (col("doc_id") < 60).cast("double"))
      .withColumn("x", graft.functions.TextFunctions
        .hashingVector(col("text"), 64).cast("array<double>"))
    val m = Classifier.lrFit(labeled, "x", "y", iters = 30,
      learningRate = 0.8)
    val acc = Classifier.lrPredict(labeled, "x", m)
      .filter(col("predicted") === col("y").cast("int")).count()
    assert(acc >= 114, s"only $acc/120 recovered") // >= 95%
  }
}
