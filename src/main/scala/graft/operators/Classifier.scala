package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeHash

/** Deterministic distributed logistic regression — the in-engine
  * trainer for rule-seeded quality classifiers (fastText-style
  * quality filters: label a seed set with [[graft.functions
  * .TextFunctions.qualityKeep]]-like rules, featurize with
  * [[graft.functions.TextFunctions.hashingVector]] /
  * [[VectorStats.pcaProjectVec]], fit here, score the corpus).
  *
  * The fit applies the library's reproducibility discipline to
  * gradient descent: each row's gradient contribution is computed in
  * double (identical per row on any engine), QUANTIZED to integer
  * micro-units (the same BigDecimal HALF_UP as [[Similarity
  * .quantize]]), and summed EXACTLY via the native
  * [[graft.functions.VecSumLong]] aggregate — so the per-iteration
  * gradient, and hence the fitted weights, are bit-identical across
  * partitionings and cluster sizes. Float-summed gradients (every
  * stock distributed LR) drift with partition order; this one does
  * not, which is what makes a refit auditable.
  *
  * Scale shape: one map-side-combined aggregation per iteration
  * (buffer = dim+2 longs), the corpus persisted once for the fit's
  * duration; scoring is map-only.
  */
object Classifier {

  final case class LrModel(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  private val GradScale = 1e6

  /** σ(w·x + b) as a Column — fixed expression shape, one exp. */
  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  private def margin(x: Column, w: Array[Double], b: Double): Column =
    aggregate(zip_with(x, typedLit(w.toSeq), (xi, wi) => xi * wi),
      lit(0.0d), _ + _) + lit(b)

  /** Fit by batch gradient descent: `iters` passes, each ONE
    * aggregation. `labelCol` must be 0/1 (checked); rows with a null
    * label or feature vector are dropped; ragged feature lengths fail
    * loudly inside the vector-sum aggregate.
    */
  def lrFit(df: DataFrame, featuresCol: String, labelCol: String,
      iters: Int = 20, learningRate: Double = 0.5,
      l2: Double = 0.0): LrModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(learningRate > 0, "learningRate must be positive")
    require(l2 >= 0, "l2 must be non-negative")
    val clean = df
      .filter(col(featuresCol).isNotNull && col(labelCol).isNotNull)
      .select(col(featuresCol).cast("array<double>").as("__x"),
        col(labelCol).cast("double").as("__y"))
    val cached = clean.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val first = cached.select(col("__x"), col("__y")).limit(1)
        .collect()
      require(first.nonEmpty,
        "lrFit: no rows with non-null features AND label")
      val dim = first(0).getSeq[Double](0).length
      val badLabel = cached
        .filter(col("__y") =!= 0.0 && col("__y") =!= 1.0).limit(1)
        .count()
      require(badLabel == 0, "lrFit: labels must be exactly 0 or 1")
      var w = new Array[Double](dim)
      var b = 0.0
      for (_ <- 0 until iters) {
        // the O(d) margin+sigmoid evaluates ONCE per row in its own
        // projection step; the per-element gradient lambda reads the
        // scalar residual instead of re-deriving it for every vector
        // element (O(d), not O(d²), work per row per iteration —
        // same value, so the fit stays bit-identical)
        val withErr = cached.select(col("__x"),
          (sigmoid(margin(col("__x"), w, b)) - col("__y")).as("__e"))
        val err = col("__e") // per-row residual, fixed shape
        // quantize each gradient component to micro-units; exact sum
        val gq = transform(col("__x"),
          xi => NativeHash.quantizeColumn(array(xi * err * lit(1000.0)))
            .getItem(0))
        val row = withErr.agg(
          NativeHash.vecSumColumn(gq).as("g"),
          sum(NativeHash.quantizeColumn(array(err * lit(1000.0)))
            .getItem(0)).as("gb"),
          count(lit(1)).as("n")).head()
        val n = row.getLong(2).toDouble
        val g = row.getSeq[Long](0).toArray
        val gb = row.getLong(1).toDouble
        var j = 0
        while (j < dim) {
          w(j) -= learningRate * (g(j) / (n * GradScale) + l2 * w(j))
          j += 1
        }
        b -= learningRate * (gb / (n * GradScale))
      }
      LrModel(w, b)
    } finally cached.unpersist(blocking = false)
  }

  /** Exact confusion counts and precision/recall at pinned
    * thresholds — the evaluation half of the filter loop (pick the
    * operating point BEFORE unleashing a filter on 100 TB). ONE
    * aggregation computes all 4·|thresholds| counters (map-side
    * combined); the per-threshold rows explode from the single
    * aggregate row, and every ratio is one divide of exact integer
    * counts — engine-replayable. A threshold with no positive
    * predictions yields null precision (undefined, not 0/0);
    * `label` must be 0/1, null-labeled or null-scored rows drop.
    */
  def thresholdMetrics(df: DataFrame, scoreCol: String,
      labelCol: String, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val clean = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("double").as("__y"))
    def cnt(pred: Column): Column =
      sum(when(pred, 1L).otherwise(0L))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      cnt(col("__s") >= t && col("__y") === 1.0).as(s"__tp$i"),
      cnt(col("__s") >= t && col("__y") === 0.0).as(s"__fp$i"),
      cnt(col("__s") < t && col("__y") === 1.0).as(s"__fn$i"),
      cnt(col("__s") < t && col("__y") === 0.0).as(s"__tn$i"))
    }
    val one = clean.agg(aggs.head, aggs.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      val (tp, fp, fn) = (col(s"__tp$i"), col(s"__fp$i"),
        col(s"__fn$i"))
      struct(lit(t).as("threshold"),
        tp.as("tp"), fp.as("fp"), fn.as("fn"),
        col(s"__tn$i").as("tn"),
        when(tp + fp > 0, tp.cast("double") /
          (tp + fp).cast("double")).as("precision"),
        when(tp + fn > 0, tp.cast("double") /
          (tp + fn).cast("double")).as("recall"))
    }
    one.select(explode(array(rows: _*)).as("__m")).select(col("__m.*"))
  }

  /** Map-only scoring: `score` = σ(w·x + b), `predicted` at 0.5.
    * Broadcast-literal weights, fixed expression shape — a score is
    * reproducible wherever the row lands.
    */
  def lrPredict(df: DataFrame, featuresCol: String, model: LrModel)
      : DataFrame = {
    val s = sigmoid(margin(col(featuresCol).cast("array<double>"),
      model.weights, model.bias))
    df.withColumn("score", s)
      .withColumn("predicted", (col("score") >= 0.5).cast("int"))
  }
}
