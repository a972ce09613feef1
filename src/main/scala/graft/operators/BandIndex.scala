package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent MinHash band index: build ONCE over the standing corpus,
  * then match every new crawl batch against it WITHOUT recomputing a
  * single corpus signature. This is the daily-increment shape of a
  * production dedup pipeline — [[Dedup.minhashDupPairs]] over
  * corpus∪batch is the right tool for a one-shot clean, but re-running
  * it per increment re-hashes the whole corpus every day.
  *
  * Layout ([[IvfIndex]] pattern, applied to LSH band keys):
  *  - `<table>`        = (band, id, sig) — one row per (document, band
  *    key), BUCKETED AND SORTED BY `band`, so the batch-vs-index join
  *    is an equi-join in which the index side never shuffles: each
  *    bucket's rows sort-merge in place while only the (small) batch
  *    repartitions to match.
  *  - `<table>_stats`  = (band, cnt) row counts per band key, bucketed
  *    the same way. Increments need the COMBINED bucket size
  *    (indexed + batch) to apply the same `maxBucket` degenerate-key
  *    cap as the full recompute — reading it from a stats table keeps
  *    the over-cap bucket from ever entering the join, instead of
  *    exploding first and filtering after.
  *  - `<table>_meta`   = (k, shingle_len, bands, seed) — the signature
  *    parameters, read back at query time so an increment can never
  *    silently run with mismatched hashing.
  *
  * Small batches additionally get true bucket pruning: if the batch
  * touches few enough distinct band keys, they are collected and pushed
  * into the index scan as a literal IN filter — the scan then reads
  * only matching buckets (`SelectedBucketsCount` in the plan), exactly
  * like [[IvfIndex.query]]'s probed lists. Larger batches skip the
  * literal push (an IN over millions of keys is a planning hazard, and
  * a batch that touches most band keys prunes nothing) and rely on the
  * shuffle-free bucketed join alone.
  *
  * Parity: for disjoint corpus/batch id sets,
  * `neardupIncrement(batch)` equals
  * `minhashDupPairs(corpus ∪ batch)` restricted to pairs with at least
  * one batch member — same candidates (shared band key), same
  * `maxBucket` cap (combined counts), same signature-agreement
  * `est_jaccard`, same threshold. Corpus-corpus pairs are the standing
  * corpus's own dedup state and are intentionally not re-reported.
  */
object BandIndex {

  /** (band, id, sig) rows for one frame: native one-pass MinHash
    * signature, then one row per LSH band key (identical hashing to
    * [[Dedup.minhashDupPairs]] — band keys carry no band ordinal, so
    * cross-band key coincidences bucket together there and here alike).
    */
  private def bandRows(df: DataFrame, idCol: String, textCol: String,
      k: Int, shingleLen: Int, bands: Int, seed: Long): DataFrame = {
    val rowsPerBand = k / bands
    df.select(col(idCol).as("id"),
        graft.functions.NativeHash
          .minhashColumn(col(textCol), k, shingleLen, seed).as("sig"))
      .select(col("id"), col("sig"),
        explode(Dedup.bandKeys(col("sig"), bands, rowsPerBand))
          .as("band"))
  }

  /** Signature-agreement Jaccard estimate between two sig arrays —
    * the exact expression [[Dedup.minhashDupPairs]] verifies with.
    */
  private def estJaccard(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, k: Int) =
    size(filter(zip_with(a, b, (x, y) => (x === y).cast("int")),
      v => v === 1)).cast("double") / lit(k)

  /** Build the index over the standing corpus. Overwrites `<table>`,
    * `<table>_stats` and `<table>_meta`. One signature pass over the
    * corpus, one (bucketed, shuffle-free) count over the written rows.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      table: String, k: Int = 16, shingleLen: Int = 5, bands: Int = 4,
      seed: Long = 42L, buckets: Int = 32): Unit = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(table, s"${table}_stats", s"${table}_meta")
      .foreach(Warehouse.dropManaged(spark, _))
    // A/B'd r19 and kept as-is: fanning the signature kernel off the
    // one-split scan (guarded corpus.repartition) + hashing by band
    // for the write measured FLAT-to-worse (q_neardup_increment
    // 2.61–2.73 → 2.83) — the two added exchanges and the extra plan
    // materialization cost more than the 0.95 s single-task build
    // they spread. At scale the scan splits on its own and the
    // map-side bucketed write is already the minimal shape.
    bandRows(corpus, idCol, textCol, k, shingleLen, bands, seed)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "band").sortBy("band").saveAsTable(table)
    // counts read from the WRITTEN rows (bucketed: groupBy shuffles
    // nothing), so stats can never drift from the index itself
    spark.table(table).groupBy("band").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "band").sortBy("band")
      .saveAsTable(s"${table}_stats")
    Seq((k, shingleLen, bands, seed, buckets))
      .toDF("k", "shingle_len", "bands", "seed", "buckets")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Append a batch to the index: its band rows join the bucketed
    * table in place (same bucket spec — no shuffle of the standing
    * rows, the new files land in matching buckets) and its per-band
    * counts append to the stats table, which readers SUM per band, so
    * the degenerate-key cap keeps binding on the true combined size.
    * This is what turns [[neardupIncrement]] into a rolling pipeline:
    * accept a batch, append it, and the next batch dedups against
    * corpus + all previously accepted batches.
    *
    * Failure semantics: the two writes are not atomic, so the STATS
    * write goes FIRST — a crash between them leaves stats
    * over-counting (the `maxBucket` cap binds early, skipping a bucket
    * it might have kept: a bounded recall loss), never under-counting
    * (a degenerate bucket slipping past the cap into quadratic pair
    * generation). Replay has the same safe direction: appending the
    * same batch twice double-counts stats and duplicates band rows —
    * duplicate rows do NOT change [[neardupIncrement]]'s pair set (it
    * is `distinct` over (id_a, id_b, est)), and inflated stats only
    * bind the cap earlier. If the ingest layer can replay or run
    * CONCURRENT appends (also unguarded — parquet appends don't
    * serialize), key appends by batch id and deduplicate on rebuild.
    */
  def append(spark: SparkSession, table: String, newDocs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val meta = spark.table(s"${table}_meta").collect()(0)
    val buckets = meta.getAs[Int]("buckets")
    val rows = bandRows(newDocs, idCol, textCol, meta.getAs[Int]("k"),
        meta.getAs[Int]("shingle_len"), meta.getAs[Int]("bands"),
        meta.getAs[Long]("seed"))
      .localCheckpoint() // two writes below: one signature pass
    // stats first — see failure semantics above
    rows.groupBy("band").agg(count(lit(1)).as("cnt"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "band").sortBy("band")
      .saveAsTable(s"${table}_stats")
    rows.write.mode("append").format("parquet")
      .bucketBy(buckets, "band").sortBy("band").saveAsTable(table)
    // the insert refreshes the WRITING session's relation cache, but
    // `newDocs` may live in a clone (foreachBatch hands micro-batches
    // from a cloned session): refresh in the CALLER's session too, or
    // its next read serves the pre-append file listing
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(s"${table}_stats")
  }

  /** Near-dup pairs between a NEW batch and the indexed corpus (plus
    * within the batch itself), as (id_a, id_b, est_jaccard) with
    * id_a < id_b — [[Dedup.minhashDupPairs]] semantics restricted to
    * pairs touching the batch. Corpus signatures are never recomputed;
    * corpus text never shuffles; the index side of the candidate join
    * never shuffles (bucketed by band).
    *
    * `pruneKeyLimit`: if the batch's distinct band keys number at most
    * this, they are pushed into the index scan as literals for bucket
    * + row-group pruning; 0 disables the probe entirely.
    */
  def neardupIncrement(spark: SparkSession, table: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxBucket: Long = 10000L,
      pruneKeyLimit: Int = 10000): DataFrame = {
    val meta = spark.table(s"${table}_meta").collect()(0)
    val k     = meta.getAs[Int]("k")
    val bands = meta.getAs[Int]("bands")
    val batch = bandRows(newDocs, idCol, textCol, k,
      meta.getAs[Int]("shingle_len"), bands, meta.getAs[Long]("seed"))
    // combined bucket size = this batch's rows + indexed rows, so the
    // degenerate-key cap binds exactly as in the full recompute
    // stats may hold several rows per band after appends: SUM them
    // (bucketed by band, so the groupBy re-shuffles nothing)
    val stats = spark.table(s"${table}_stats")
      .groupBy("band").agg(sum("cnt").as("cnt"))
    val sized = batch
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("band")))
      .join(stats, Seq("band"), "left")
      .withColumn("__bc", col("__bn") + coalesce(col("cnt"), lit(0L)))
      .filter(col("__bc") >= 2 && col("__bc") <= maxBucket)
      .select("band", "id", "sig")
      .localCheckpoint() // reused by three consumers (probe, bb, cb):
                         // cut the signature pipeline to one evaluation
    // batch×batch pairs (the batch is the small side by definition)
    val bb = sized
      .groupBy("band").agg(collect_list(struct(col("id"), col("sig")))
        .as("__ps"))
      .select(explode(BucketPairs.pairs(col("__ps"))).as("p"))
      .select(col("p.a.id").as("ia"), col("p.a.sig").as("sa"),
        col("p.b.id").as("ib"), col("p.b.sig").as("sb"))
    // corpus×batch pairs: bucketed equi-join, index side in place
    val idx0 = spark.table(table)
    val idx =
      if (pruneKeyLimit <= 0) idx0
      else {
        val probe = sized.select("band").distinct()
          .limit(pruneKeyLimit + 1).collect().map(_.getString(0))
        if (probe.length > pruneKeyLimit) idx0 // batch too wide to prune
        else idx0.filter(col("band").isin(probe.toSeq: _*))
      }
    val cb = idx
      .join(sized.select(col("band"), col("id").as("__bid"),
        col("sig").as("__bsig")), Seq("band"))
      .select(col("id").as("ia"), col("sig").as("sa"),
        col("__bid").as("ib"), col("__bsig").as("sb"))
    bb.unionByName(cb)
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        estJaccard(col("sa"), col("sb"), k).as("est_jaccard"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }
}
