package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed statistics over embedding columns — the aggregation side
  * of the vector toolkit (Similarity covers search). Everything here is
  * exact and engine-portable: vectors quantize to int milli-units (the
  * library standard), sums are int64, and only the final mean divides —
  * so results are bit-identical on any engine and any partitioning
  * (never an accumulation-order-dependent float sum).
  */
object VectorStats {

  /** Per-group centroid in LONG form: one row per (group, dimension)
    * with the exact mean. Scalar output columns (`pos`, `centroid`,
    * `n_vectors`) keep results portable across engines and sinks —
    * array re-assembly is one `sort_array(collect_list(...))` away for
    * callers that want vectors back.
    *
    * Scale: posexplode materializes rows×dim records, but the hash
    * aggregation partial-combines map-side, so the single shuffle
    * carries at most groups×dim partial sums per task — independent of
    * corpus size.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol),
        posexplode(Similarity.quantize(col(vecCol)))
          .as(Seq("pos", "q")))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum("q").as("__sq"), count(lit(1)).as("n_vectors"))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        (col("__sq").cast("double") / (col("n_vectors") * 1000))
          .as("centroid"),
        col("n_vectors"))

  /** Embedding-space drift between two corpus snapshots: per-
    * dimension exact milli-unit sums → deterministic means and their
    * shift. The scalar drift family (PSI, KS, category drift) watches
    * columns; this watches the VECTOR space — an embedding-model or
    * upstream-distribution change moves per-dimension means long
    * before any scalar column notices. Two partial-aggregated sums,
    * one tiny join: shuffle is O(dim), never corpus-sized.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String)
      : DataFrame = {
    def sums(df: DataFrame, tag: String) =
      df.select(posexplode(Similarity.quantize(col(vecCol)))
          .as(Seq("pos", "q")))
        .groupBy(col("pos"))
        .agg(sum("q").as(s"__sq_$tag"),
          count(lit(1)).as(s"n_$tag"))
    sums(a, "a").join(sums(b, "b"), "pos")
      .select(col("pos").cast("long").as("pos"),
        col("n_a"), col("n_b"),
        (col("__sq_a").cast("double") / (col("n_a") * 1000))
          .as("mean_a"),
        (col("__sq_b").cast("double") / (col("n_b") * 1000))
          .as("mean_b"))
      .withColumn("shift", col("mean_a") - col("mean_b"))
  }

  /** Exact upper-triangle gram matrix Σ v·vᵀ of the QUANTIZED vectors,
    * one row per (i, j) with 1-based i ≤ j. ONE aggregation: the
    * native [[graft.functions.VecOuterSumLong]] buffer (d(d+1)/2
    * int64 sums) partial-merges map-side, so at 100 TB the shuffle
    * carries one ~16 KB buffer per task and the result is a single
    * driver-sized row regardless of corpus size; the explode back to
    * rows happens AFTER the reduction. All-integer, so bit-identical
    * on any partitioning (and replayable as plain SQL).
    */
  def gramMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val g = df.agg(graft.functions.NativeHash
      .vecOuterSumColumn(Similarity.quantize(col(vecCol))).as("g"))
    // recover d from the triangle length L = d(d+1)/2
    val withD = g.select(col("g"),
      round((sqrt(size(col("g")).cast("double") * 8 + 1) - 1) / 2)
        .cast("int").as("d"))
    withD
      .select(col("g"), col("d"),
        explode(sequence(lit(0), col("d") - 1)).as("i0"))
      .select(col("g"), col("d"), col("i0"),
        explode(sequence(col("i0"), col("d") - 1)).as("j0"))
      .select(
        (col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"),
        element_at(col("g"),
          (col("i0") * col("d") - col("i0") * (col("i0") - 1) / 2 +
            (col("j0") - col("i0")) + 1).cast("int")).as("s"))
  }

  /** Fitted PCA basis: `mean(i)` is the per-dimension mean,
    * `components(c)(i)` the c-th principal axis (unit length, sorted
    * by eigenvalue descending, sign-canonicalized so the
    * largest-magnitude coordinate is positive), `variance(c)` its
    * eigenvalue.
    */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], variance: Array[Double]) {
    require(components.length == variance.length)
    def k: Int = components.length
  }

  /** Distributed PCA fit: the corpus reduces to ONE aggregation row
    * (gram triangle + dimension sums + count — the only data-sized
    * work), then the d×d covariance eigen-solve runs on the driver
    * (cyclic Jacobi, O(d³), trivial for embedding-sized d). The
    * quantized integer sums make the covariance — and hence the
    * fitted basis — bit-identical across partitionings; Jacobi
    * itself is deterministic (fixed cyclic pivot order).
    *
    * The classic scale path for ANN: project 100 TB of embeddings to
    * the top-k axes once, then index/search in the reduced space.
    */
  def pcaFit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k > 0, s"k must be positive, got $k")
    val qv = Similarity.quantize(col(vecCol))
    val row = df.agg(
      graft.functions.NativeHash.vecOuterSumColumn(qv).as("g"),
      graft.functions.NativeHash.vecSumColumn(qv).as("m"),
      count(vecCol).as("n")).head()
    require(!row.isNullAt(0), "pcaFit: no non-null vectors")
    val g = row.getSeq[Long](0).toArray
    val m = row.getSeq[Long](1).toArray
    val n = row.getLong(2).toDouble
    val d = m.length
    require(k <= d, s"k=$k exceeds dimension $d")
    // covariance in float units: qv = 1000·v, so E[v_i v_j] =
    // G_ij/(n·1e6) and mean_i = M_i/(n·1e3)
    val mean = m.map(_ / (n * 1000.0))
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val c = g(idx) / (n * 1e6) - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(k)
    val comps = order.map { c =>
      val w = Array.tabulate(d)(i => eigVecs(i)(c))
      // canonical sign: the largest-|coordinate| (first on ties) > 0
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, comps, order.map(eigVals).toArray)
  }

  /** Project each vector onto the model's axes: `proj(c) = (v − mean)
    * · component(c)`. Map-only (no shuffle); the per-row dot products
    * evaluate in fixed left-to-right order against broadcast literal
    * axes, so results are deterministic everywhere.
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val projCols = model.components.zipWithIndex.map { case (w, c) =>
      val centeredDot = aggregate(
        zip_with(col(vecCol).cast("array<double>"),
          typedLit(w.toSeq), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x) -
        lit(model.mean.zip(w).map { case (a, b) => a * b }.sum)
      centeredDot.as(s"pc${c + 1}")
    }
    df.select(col(idCol) +: projCols: _*)
  }

  /** [[pcaProject]] with the projections as ONE `array<double>`
    * column `proj` — the shape the vector operators (ANN / PQ /
    * centroids) consume, so "embed → reduce → index" composes
    * without a reshape: `pcaProjectVec(...)` feeds
    * `Similarity.bruteForceTopK(..., quantized = true)` or
    * `ProductQuant.pqFit/pqTopK` directly. Map-only, like
    * [[pcaProject]].
    */
  def pcaProjectVec(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val projected = pcaProject(df, idCol, vecCol, model)
    projected.select(col(idCol),
      array((1 to model.k).map(c => col(s"pc$c")): _*).as("proj"))
  }

  /** Embedding-space outlier detection: flag vectors unusually far
    * from their OWN group's centroid — mislabeled rows, junk
    * embeddings, domain drift inside a label. Composed from the
    * library's replayable pieces so the whole thing stays
    * engine-portable: per-group quantized-integer centroid sums
    * (re-quantized to milli-units with one double divide + HALF_UP
    * round each), EXACT int64 squared distances to the own-group
    * centroid, and a per-group [[ColumnStats.groupedExactQuantiles]]
    * threshold at `p` — `is_outlier` = dist² strictly above the
    * group's p-quantile. Two keyed aggregations + one broadcast
    * centroid join + the quantile chain; the corpus shuffles once (on
    * the group key inside the quantile's value-count reduction —
    * distances themselves stay put). `idCol` names the row
    * identifier carried through to the output (default "vec_id") —
    * frames keyed differently pass their own instead of being forced
    * to rename.
    */
  def centroidOutliers(df: DataFrame, labelCol: String,
      vecCol: String, p: Double = 0.95,
      idCol: String = "vec_id"): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0, 1), got $p")
    val v = df
      .filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(labelCol).as("__g"),
        Similarity.quantize(col(vecCol)).as("__qv"))
    val cents = v.groupBy("__g")
      .agg(graft.functions.NativeHash.vecSumColumn(col("__qv"))
        .as("__s"), count(lit(1)).as("__n"))
      .select(col("__g"), transform(col("__s"),
        s => round(s.cast("double") / col("__n"), 0).cast("long"))
        .as("__qc"))
    val dists = v.join(broadcast(cents), Seq("__g"))
      .select(col(idCol), col("__g"),
        aggregate(zip_with(col("__qv"), col("__qc"),
          (a, b) => (a - b) * (a - b)), lit(0L), _ + _).as("dist2"))
    val th = ColumnStats.groupedExactQuantiles(dists, "__g", "dist2",
        Seq(p))
      .select(col("__g").cast("string").as("__gs"),
        col("quantile").as("__th"))
    dists
      .join(broadcast(th), col("__g").cast("string") === col("__gs"))
      .select(col(idCol), col("__g").as(labelCol), col("dist2"),
        (col("dist2").cast("double") > col("__th")).as("is_outlier"))
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-columns). Deterministic: fixed
    * sweep order, converges when the off-diagonal Frobenius mass
    * drops below `tol` (quadratic convergence — a handful of sweeps
    * for embedding-sized matrices).
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-14)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1.0, a.indices.map(i => math.abs(a(i)(i))).max)
    while (off > tol * scale * scale && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d
          if math.abs(a(p)(q)) > 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
          case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
        }
        val c = 1.0 / math.sqrt(t * t + 1)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
