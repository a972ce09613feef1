package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NativeHash
import graft.operators.ProductQuant.PqCodebook
import graft.operators.Similarity.quantize

/** Persistent IVF-PQ ANN index: the compressed serving form of
  * [[ProductQuant.ivfPqTopK]]. The index stores per corpus row ONLY
  * (id, m PQ codes, coarse list id) — no raw vectors — bucketed by
  * list id, so at 100 TB the index is ~1/64th the corpus bytes AND a
  * query reads only its probed lists' buckets (bucket pruning at the
  * scan, no shuffle, no re-fit, no decompression). Build twice over
  * the same corpus → byte-identical index (deterministic coarse fit,
  * exact-int encode).
  *
  * Layout: `<table>` = (neighbor_id, codes, __list) bucketed+sorted
  * by __list; `<table>_centroids` = (list_id, vec);
  * `<table>_codebook` = (subspace, code, vec). The codebook rides to
  * disk so a reader needs no side-channel state.
  */
object IvfPqIndex {

  /** Fit the coarse quantizer, encode the corpus, persist all three
    * tables (overwrites). `buckets` ≈ nCentroids keeps pruning exact;
    * `buckets = 0` takes one bucket per list. `nCentroids = 0`
    * auto-scales the list count to ~`n / targetListSize` and, past
    * [[Similarity.FlatKCeiling]], fits through the two-level
    * hierarchy ([[Similarity.fitIndexCentroids]]) — the stored layout
    * is the same flat (list_id, vec) table either way, so serving,
    * append and readers are fit-agnostic.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      table: String, cb: PqCodebook, nCentroids: Int = 16,
      kmeansIters: Int = 2, buckets: Int = 16,
      targetListSize: Long = 1000L): Unit = {
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("__cv"))
    val (cents, assign) = Similarity.fitIndexCentroids(cq,
      "neighbor_id", "__cv", nCentroids, kmeansIters, targetListSize)
    val nBuckets = if (buckets > 0) buckets else cents.length
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(table, s"${table}_centroids", s"${table}_codebook",
        s"${table}_meta")
      .foreach(Warehouse.dropManaged(spark, _))
    Seq((nBuckets, cents.length)).toDF("buckets", "n_centroids")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("list_id", "vec")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    (for {
      (subs, s) <- cb.codebook.zipWithIndex
      (cvec, j) <- subs.zipWithIndex
    } yield (s, j, cvec)).toDF("subspace", "code", "vec")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_codebook")
    cq.select(col("neighbor_id"),
        NativeHash.pqEncodeColumn(col("__cv"), cb.codebook)
          .as("codes"),
        assign.as("__list"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "__list").sortBy("__list")
      .saveAsTable(table)
  }

  /** Open for repeated serving: centroids and codebook collected ONCE
    * (≤ nCentroids + m·ksub rows); each query batch then costs one
    * driver action (its probed-list union) before the result plan.
    */
  def reader(spark: SparkSession, table: String): IvfPqReader = {
    import spark.implicits._
    val cents: Array[Seq[Long]] = spark.table(s"${table}_centroids")
      .orderBy("list_id").select("vec")
      .as[Seq[Long]].collect().map(x => x: Seq[Long])
    val cbRows = spark.table(s"${table}_codebook")
      .orderBy("subspace", "code")
      .as[(Int, Int, Seq[Long])].collect()
    val cb = PqCodebook(cbRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq })
    new IvfPqReader(spark, table, cents, cb)
  }

  /** One-shot form: open + one batch. Serving loops should hold a
    * [[reader]].
    */
  def query(spark: SparkSession, table: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4)
      : DataFrame =
    reader(spark, table).query(queries, idCol, vecCol, k, nProbe)

  /** Append a new batch WITHOUT refitting: assign + encode with the
    * STORED centroids and codebook, insert into the same bucket
    * layout. The standing corpus is never re-read or re-encoded —
    * index maintenance cost is O(batch), the property that makes a
    * rolling 100 TB corpus affordable. (Coarse lists drift as the
    * distribution moves; rebuild when recall audits say so — the
    * non-residual codes survive a coarse refit unchanged.)
    */
  def append(spark: SparkSession, table: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val r = reader(spark, table)
    val buckets = spark.table(s"${table}_meta").collect()(0)
      .getAs[Int]("buckets")
    batch.select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("__cv"))
      .select(col("neighbor_id"),
        NativeHash.pqEncodeColumn(col("__cv"), r.codebook.codebook)
          .as("codes"),
        NativeHash.nearestCentroidColumn(col("__cv"),
          r.centroids.toSeq).as("__list"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "__list").sortBy("__list")
      .saveAsTable(table)
    // refresh the CALLER's relation cache (micro-batch clones — same
    // failure mode as BandIndex.append)
    spark.catalog.refreshTable(table)
  }
}

/** Serving handle over a built [[IvfPqIndex]]: centroids + codebook
  * pinned on the driver, one action per query batch. Output matches
  * [[ProductQuant.ivfPqTopK]] exactly for the same parameters:
  * (query_id, neighbor_id, adist2, rank).
  */
final class IvfPqReader private[operators] (spark: SparkSession,
    table: String, cents: Array[Seq[Long]], cb: PqCodebook) {
  import spark.implicits._

  def codebook: PqCodebook = cb
  private[operators] def centroids: Array[Seq[Long]] = cents

  /** Top-`k` per query row by exact asymmetric distance. Probed list
    * ids are collected (≤ nCentroids) and pushed into the scan
    * filter, so bucket pruning skips every unprobed list's files;
    * the corpus side read is codes-only.
    */
  def query(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    val qq = queries.select(col(idCol).as("query_id"),
        quantize(col(vecCol)).as("__qv"))
      .withColumn("__list", explode(NativeHash.probeCentroidsColumn(
        col("__qv"), cents.toSeq, math.min(nProbe, cents.length))))
    val probed = qq.select("__list").distinct()
      .as[Int].collect().toSeq.sorted // ≤ nCentroids values
    val scored = spark.table(table)
      .filter(col("__list").isin(probed: _*))
      .join(broadcast(qq), Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        NativeHash.pqAdcDistColumn(col("__qv"), col("codes"),
          cb.codebook).as("adist2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
