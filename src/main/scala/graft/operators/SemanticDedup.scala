package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): k-means the corpus
  * embeddings, then treat cosine-similar pairs WITHIN a cluster as
  * duplicates and keep one representative per connected component.
  *
  * This complements the rest of the dedup family: exact/minhash/
  * simhash/n-gram catch lexical overlap, [[Similarity.cosineDupPairs]]
  * catches embedding-near pairs that happen to share an LSH bucket;
  * SemDeDup scopes the exact-cosine check to a learned partition of
  * the embedding space, which is the published recipe for semantic
  * (paraphrase-level) dedup of web-scale corpora.
  *
  * Scale design:
  *  - The k-means fit ([[Similarity.fitCentroidsKMeans]]) reduces each
  *    partition map-side to ≤ nCentroids rows of component sums per
  *    iteration; driver state is nCentroids × dim longs. Corpus
  *    vectors never shuffle during the fit.
  *  - Assignment is a per-row expression (no join, no shuffle); the
  *    only data-sized shuffle is the ONE cluster-key exchange that
  *    groups members for pairing.
  *  - Within-cluster pairing is quadratic in CLUSTER size by design —
  *    that is the SemDeDup trade. Size `nCentroids ≈ corpus/√target`
  *    so the per-cluster work is bounded; `maxCluster` hard-caps
  *    adversarial clusters (they are dropped from pair generation,
  *    same bounded-recall contract as the LSH bucket caps).
  *  - Pairs are unique by construction (each id lives in exactly one
  *    cluster), so no distinct pass is needed — one fewer shuffle
  *    than the multi-band LSH path.
  */
object SemanticDedup {

  /** Auto-sized centroid count: one cluster per `targetClusterSize`
    * rows, so within-cluster candidate pairs stay ~n·target — LINEAR
    * in the corpus (the 10× stress harness measured 74× shuffle growth
    * at a FIXED k: same data, 10× rows, 100× candidate pairs). Up to
    * [[Similarity.FlatKCeiling]] the fit is flat; past it the auto
    * path fits a two-level hierarchy (assignment O(2√k·dim) per row).
    * Capped at [[MaxAutoCentroids]]: the remaining k-proportional
    * cost is DRIVER state — k × dim int64 centroids broadcast as one
    * reference object (33 MB at the cap for dim 64). Past that,
    * shard the corpus and run per-shard.
    */
  val DefaultTargetClusterSize = 1000L
  val MaxAutoCentroids         = 65536

  private def autoCentroids(n: Long, target: Long): Int =
    math.max(1L, math.min(((n + target - 1) / target),
      MaxAutoCentroids.toLong)).toInt

  /** Within-cluster exact-cosine duplicate pairs `(id_a, id_b,
    * cosine)` with `id_a < id_b` and cosine ≥ `threshold`. Cosine is
    * computed on milli-unit quantized vectors (exact int64 dots, one
    * correctly-rounded double divide) so it is bit-reproducible on
    * any engine — the DuckDB oracle replays the fit and the scoring.
    *
    * `nCentroids ≤ 0` (the default) auto-sizes the centroid count to
    * the corpus — see [[autoCentroids]]; pass an explicit k only when
    * an external contract (an oracle replay, a pre-fit index) pins it.
    */
  def semanticDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nCentroids: Int = 0,
      kmeansIters: Int = 2,
      maxCluster: Long = 100000L,
      targetClusterSize: Long = DefaultTargetClusterSize): DataFrame = {
    val cq = df.select(col(idCol).as("id"),
        Similarity.quantize(col(vecCol)).as("__cv"))
      .withColumn("__cn", Similarity.dotQ(col("__cv"), col("__cv")))
    // persist BEFORE the auto-k count so the count and the fit's
    // iters+1 jobs share one evaluation of the scan+quantize pipeline
    val cached = cq.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val listCol: org.apache.spark.sql.Column =
      try {
        val k =
          if (nCentroids > 0) nCentroids
          else autoCentroids(cached.count(), targetClusterSize)
        if (k <= Similarity.FlatKCeiling)
          IvfCentroids.nearestList(col("__cv"),
            Similarity.fitCentroidsKMeans(cached, "id", "__cv",
              k, kmeansIters, managePersist = false))
        else {
          // past the flat ceiling the auto path goes hierarchical —
          // same bounded cluster sizes, O(2sqrt(k)·dim) assignment
          val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
          IvfCentroids.nearestListTwoLevel(col("__cv"),
            Similarity.fitCentroidsTwoLevel(cached, "id", "__cv",
              k1, k1, kmeansIters, managePersist = false))
        }
      } finally cached.unpersist(blocking = false)
    val listed = cq.withColumn("__list", listCol)
    val p = BucketPairs.bucketedPairs(listed, col("__list"),
      struct(col("id"), col("__cv"), col("__cn")), maxCluster,
      fanOut = true)
    p.select(least(col("p.a.id"), col("p.b.id")).as("id_a"),
        greatest(col("p.a.id"), col("p.b.id")).as("id_b"),
        (Similarity.dotQ(col("p.a.__cv"), col("p.b.__cv"))
          .cast("double") /
          sqrt(col("p.a.__cn").cast("double") *
               col("p.b.__cn").cast("double"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The delete: keep exactly one row per semantic-duplicate
    * component (the smallest id — [[Dedup.dedupCorpus]] semantics).
    * Components never span clusters, so they are small by the same
    * bound that caps the pairing.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nCentroids: Int = 0,
      kmeansIters: Int = 2,
      maxCluster: Long = 100000L,
      targetClusterSize: Long = DefaultTargetClusterSize): DataFrame = {
    val pairs = semanticDupPairs(df, idCol, vecCol, threshold,
      nCentroids, kmeansIters, maxCluster, targetClusterSize)
      .select("id_a", "id_b")
    Dedup.dedupCorpus(df, idCol, pairs)
  }
}
