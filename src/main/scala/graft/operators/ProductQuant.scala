package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.NativeHash

/** Product quantization over the embedding column — the
  * compressed-domain ANN representation (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011). The
  * d-dim quantized vector splits into `m` contiguous subvectors; each
  * subvector is replaced by the index of its nearest (exact int64
  * squared-L2) centroid in that subspace's `ksub`-entry codebook. A
  * corpus row then stores m small ints instead of d floats — at
  * m = 8, ksub = 256 that is 8 bytes per vector instead of 256, the
  * difference between a 100 TB corpus whose index fits in cluster
  * memory and one that doesn't. Search scores full-precision queries
  * against codes (asymmetric distance) without ever decompressing the
  * corpus.
  *
  * Everything here is deterministic and engine-portable: quantized
  * integer subvectors, exact int64 distances, ties to the lowest
  * code, floored integer centroid updates in the fit — the same
  * discipline as the IVF fit ([[Similarity.fitCentroidsKMeans]]), so
  * a SQL engine replaying the construction byte-for-byte agrees
  * (q_pq_encode / q_pq_topk replay encode and ADC ranking in DuckDB
  * from a pinned codebook).
  *
  * Beyond-parity surface: the reference (a single-node cleaning
  * library) has no vector search; this is part of SURVEY §2.12's
  * training-data-curation additions.
  */
object ProductQuant {

  /** `codebook(s)(j)` = centroid j of subspace s, in quantized
    * milli-units. Rectangular: every subspace has the same `ksub` and
    * `dsub` (enforced at construction).
    */
  final case class PqCodebook(codebook: Seq[Seq[Seq[Long]]]) {
    require(codebook.nonEmpty, "codebook needs at least one subspace")
    val m: Int    = codebook.length
    val ksub: Int = codebook.head.length
    val dsub: Int = codebook.head.head.length
    require(codebook.forall(_.length == ksub),
      "ragged codebook: unequal centroid counts across subspaces")
    require(codebook.flatten.forall(_.length == dsub),
      "ragged codebook: unequal centroid dimensions")
    def dim: Int = m * dsub
  }

  /** Deterministic distributed PQ fit: per-subspace k-means on the
    * quantized subvectors. One persisted scan of the corpus feeds
    * `iters + 1` jobs TOTAL — the seed sample plus ONE grouped
    * aggregation per iteration covering ALL subspaces at once (codes
    * via the native [[graft.functions.PqEncode]] kernel, posexplode
    * to (subspace, code), map-side-combined count + element sums per
    * cell) — never a job per subspace. Shuffle volume per iteration
    * is ≤ m·ksub rows of dsub sums per partition, independent of
    * corpus size.
    *
    * Determinism (same story as the IVF fit): seeds are the `ksub`
    * smallest (md5(id), id) rows' subvectors, assignment is exact
    * int64 argmin with ties to the lowest code, updates are floored
    * integer means, and a cell that owns no rows keeps its centroid —
    * so the fitted codebook is partitioning- and engine-independent.
    */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int = 4): PqCodebook = {
    require(m > 0 && ksub > 0 && iters >= 0,
      s"m/ksub must be positive, iters >= 0 (got $m/$ksub/$iters)")
    val cq = df.select(col(idCol).as("__id"),
      Similarity.quantize(col(vecCol)).as("__qv"))
    val cached = cq.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRows = cached
        .orderBy(md5(col("__id").cast("string")), col("__id"))
        .limit(ksub)
        .select(col("__qv")).collect().map(_.getSeq[Long](0))
      require(seedRows.nonEmpty, "corpus is empty")
      require(seedRows.length == ksub,
        s"corpus has ${seedRows.length} rows < ksub=$ksub")
      val d = seedRows.head.length
      require(d % m == 0, s"dimension $d not divisible by m=$m")
      val dsub = d / m
      var cb: Array[Array[Seq[Long]]] = Array.tabulate(m, ksub) {
        (s, j) => seedRows(j).slice(s * dsub, (s + 1) * dsub)
      }
      for (_ <- 0 until iters) {
        val codes = NativeHash.pqEncodeColumn(col("__qv"),
          cb.toSeq.map(_.toSeq))
        val upd = cached
          .select(col("__qv"), posexplode(codes).as(Seq("__s", "__c")))
          .groupBy("__s", "__c")
          .agg(count(lit(1)).as("__n"),
            NativeHash.vecSumColumn(
              slice(col("__qv"), col("__s") * dsub + 1, lit(dsub)))
              .as("__sums"))
          .collect()
        val next = cb.map(_.clone())
        upd.foreach { r =>
          val s = r.getAs[Int]("__s")
          val c = r.getAs[Int]("__c")
          val n = r.getAs[Long]("__n").toDouble
          next(s)(c) = r.getSeq[Long](r.fieldIndex("__sums"))
            .map(x => math.floor(x / n).toLong)
        }
        cb = next
      }
      PqCodebook(cb.toSeq.map(_.toSeq))
    } finally cached.unpersist(blocking = false)
  }

  /** Compress the corpus to codes: (id, codes array<int>). Map-only —
    * no shuffle, no driver data; the codebook rides into the scan as
    * one broadcast-with-the-plan reference object. This output (8-ish
    * bytes a row) is what a 100 TB deployment persists as its index.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame =
    df.select(col(idCol),
      NativeHash.pqEncodeColumn(
        Similarity.quantize(col(vecCol)), cb.codebook).as("codes"))

  /** Asymmetric-distance top-k: full-precision queries against the
    * compressed corpus. The corpus side is scanned once (codes
    * computed on the fly here; pre-encoded corpora can feed
    * [[pqTopKEncoded]]) and never shuffled — the broadcast query side
    * fans each corpus row into |queries| (query, code-distance) pairs
    * and only those reach the per-query top-k window (AQE runs it as
    * a partial top-k). Exact int64 ADC distances; ties to the lowest
    * neighbor id.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: PqCodebook, k: Int): DataFrame =
    pqTopKEncoded(pqEncode(corpus, idCol, vecCol, cb), queries,
      idCol, vecCol, cb, k)

  /** IVF-PQ: coarse inverted-list pruning composed with ADC scoring
    * over codes — the standard big-corpus ANN architecture (Jégou et
    * al. 2011 §V): the corpus is stored as (coarse list, m codes) —
    * bytes per row — queries probe their `nProbe` nearest coarse
    * lists and score ONLY those lists' codes, so search cost is
    * probed-fraction × compressed-scan. Same deterministic coarse
    * quantizer as [[Similarity.ivfTopK]] (md5-seeded spherical
    * k-means, exact int64 scores, lowest-index ties) and the same
    * non-residual codes as [[pqEncode]] (one codebook shared across
    * lists, so the code column is independent of the coarse k;
    * residual encoding would buy recall at the cost of re-encoding
    * whenever the coarse quantizer changes — the classic trade,
    * documented not taken).
    *
    * Scale shape: corpus scanned once (assign + encode in the same
    * projection), broadcast query probes, one per-query top-k window
    * (WindowGroupLimit pre-filters map-side). With `nProbe` =
    * `nCentroids` every list is probed and the ranking equals
    * [[pqTopK]] exactly (PqSpec pins this).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: PqCodebook, k: Int, nCentroids: Int = 16,
      nProbe: Int = 4, kmeansIters: Int = 2): DataFrame = {
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.quantize(col(vecCol)).as("__cv"))
    val cents = Similarity.fitCentroidsKMeans(cq, "neighbor_id",
      "__cv", nCentroids, kmeansIters)
    val listed = cq.select(col("neighbor_id"),
      NativeHash.nearestCentroidColumn(col("__cv"), cents)
        .as("__list"),
      NativeHash.pqEncodeColumn(col("__cv"), cb.codebook).as("codes"))
    val qq = queries.select(col(idCol).as("query_id"),
        Similarity.quantize(col(vecCol)).as("__qv"))
      .withColumn("__list", explode(NativeHash.probeCentroidsColumn(
        col("__qv"), cents, math.min(nProbe, cents.length))))
    val scored = listed.join(broadcast(qq), Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        NativeHash.pqAdcDistColumn(col("__qv"), col("codes"),
          cb.codebook).as("adist2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[pqTopK]] over a pre-encoded corpus `(idCol, codes)` — the
    * standing-index form: at scale the encode runs once at ingest and
    * searches touch ONLY the code column (8-ish bytes a row), never
    * the raw vectors.
    */
  def pqTopKEncoded(encoded: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: PqCodebook, k: Int)
      : DataFrame = {
    val qq = queries.select(col(idCol).as("query_id"),
      Similarity.quantize(col(vecCol)).as("__qv"))
    val scored = encoded
      .join(broadcast(qq), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        NativeHash.pqAdcDistColumn(col("__qv"), col("codes"),
          cb.codebook).as("adist2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
