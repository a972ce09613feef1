package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lakehouse MAINTENANCE planning — the two jobs a 100 TB table
  * needs scheduled constantly, expressed as Spark plans (not
  * drivers):
  *
  *  - [[compactionPlan]]: the small-files problem. Streaming
  *    ingestion leaves thousands of under-sized files per
  *    partition; a compaction (OPTIMIZE) run bin-packs them into
  *    target-sized rewrite groups. The assignment here is next-fit
  *    by cumulative bytes — ONE windowed cumulative sum partitioned
  *    by the table partition (parallel across partitions, never a
  *    global sort) followed by integer division; the whole plan is
  *    a partitioned window + hash aggregate.
  *
  *  - [[orphanFiles]]: files on storage not referenced by any
  *    snapshot's manifests (failed writes, expired snapshots) —
  *    found with a LEFT ANTI join of the listing against the
  *    referenced-path set. The anti join shuffles (or broadcasts)
  *    on the path hash; there is no per-file driver loop anywhere.
  */
object Maintenance {

  /** Next-fit bin packing of a file census into rewrite groups.
    *
    * @param files (partCol, sizeCol, orderCol) rows
    * @param target bin capacity in the size column's unit
    * @return one row per (partition, bin): file count, total
    *         bytes, and whether the bin is still undersized
    *         (< target/2 — the signal compaction did not help,
    *         e.g. a partition tail)
    */
  def compactionPlan(files: DataFrame, partCol: String,
      sizeCol: String, orderCol: String, target: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      // next-fit by bytes: a file belongs to the bin its EXCLUSIVE
      // prefix fills. EXACT integer division (`div`), not double
      // division cast back: doubles are exact only while cumulative
      // bytes stay under 2^53 — at multi-PB per-partition totals,
      // bins near boundaries would drift off the oracle's `//`
      .withColumn("bin",
        expr(s"(__cum - `$sizeCol`) div ${target}L"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).cast("int").as("n_files"),
        sum(col(sizeCol)).as("bytes"))
      .withColumn("undersized", col("bytes") < lit(target / 2))
  }

  /** Per-file bin assignment — the same next-fit arithmetic as
    * [[compactionPlan]] but kept at file grain, so the rewrite can
    * join it back onto the data. One partitioned window, no
    * aggregate.
    */
  def compactionAssign(files: DataFrame, partCol: String,
      sizeCol: String, orderCol: String, target: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin", expr(s"(__cum - `$sizeCol`) div ${target}L"))
      .drop("__cum")
  }

  /** Execute the compaction: stamp each data row with its file's
    * bin (broadcast join — the file census is metadata-sized even
    * when the data is 100 TB), ONE hash shuffle to co-locate each
    * (partition, bin), and a partitioned write where every bin
    * becomes exactly one output file (all rows of a (part, bin) key
    * land in one task, and each task writes one file per directory;
    * maxRecordsPerFile guards a runaway bin). No driver loop, no
    * global sort.
    */
  /** The rewrite's read-side plan (exposed so the spec can pin its
    * shuffle shape: ONE broadcast join + ONE hash exchange).
    */
  def compactionRewrite(data: DataFrame, partCol: String,
      fileCol: String, assign: DataFrame): DataFrame = {
    val a = assign.select(col(partCol), col(fileCol), col("bin"))
    data
      .join(broadcast(a), Seq(partCol, fileCol))
      .repartition(col(partCol), col("bin"))
  }

  def compactionApply(data: DataFrame, partCol: String,
      fileCol: String, assign: DataFrame, outPath: String,
      maxRecordsPerFile: Long = 1L << 22): Unit =
    compactionRewrite(data, partCol, fileCol, assign)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol, "bin")
      .parquet(outPath)

  /** Clustering depth — the read-amplification metric that drives
    * Z-order/OPTIMIZE decisions: given each file's [min, max] on a
    * sort key (the zone maps of C238/C249), how many files can one
    * point lookup be forced to read? A perfectly clustered
    * partition has depth 1; every overlap adds a file to every
    * lookup in the overlapped range.
    *
    * Boundary sweep, fully distributed: each file contributes
    * (+1 at min) and (-1 at max+1) events; a per-partition windowed
    * cumulative sum over the merged boundaries IS the depth
    * profile. Surfaced per partition: max depth, the exact depth
    * integral (Σ depth × segment length — divide by span_len for
    * average read amplification; kept as two integers so the
    * result is engine-exact), span length, boundary count.
    */
  def clusteringDepth(files: DataFrame, partCol: String,
      minCol: String, maxCol: String): DataFrame = {
    val opens = files.select(col(partCol).as("part"),
      col(minCol).cast("bigint").as("k"), lit(1L).as("d"))
    val closes = files.select(col(partCol).as("part"),
      (col(maxCol) + 1).cast("bigint").as("k"), lit(-1L).as("d"))
    // ONE shuffle for the whole sweep: hash-partitioning by part
    // alone satisfies the (part, k) grouping's clustered
    // distribution AND the window AND the final per-part aggregate,
    // so Catalyst reuses this exchange for all three
    val ev = opens.unionByName(closes)
      .repartition(col("part"))
      .groupBy(col("part"), col("k"))
      .agg(sum(col("d")).as("d"))
    val byK = Window.partitionBy(col("part")).orderBy(col("k"))
    val cum = byK.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    ev
      .withColumn("depth", sum(col("d")).over(cum))
      .withColumn("nk", lead(col("k"), 1).over(byK))
      .groupBy(col("part"))
      .agg(max(col("depth")).cast("int").as("max_depth"),
        sum(when(col("nk").isNull, 0L)
          .otherwise(col("depth") * (col("nk") - col("k"))))
          .cast("bigint").as("depth_area"),
        sum(when(col("nk").isNull, 0L)
          .otherwise(col("nk") - col("k")))
          .cast("bigint").as("span_len"),
        count(lit(1)).cast("int").as("n_boundaries"))
  }

  /** Orphan sweep: listing MINUS referenced, via left-anti join.
    * Returns per-owner orphan counts and bytes (owner = whatever
    * key the caller carries on the listing, e.g. the table id).
    */
  def orphanFiles(listing: DataFrame, pathCol: String,
      sizeCol: String, ownerCol: String,
      referenced: DataFrame, refPathCol: String): DataFrame =
    listing
      .join(referenced,
        listing(pathCol) === referenced(refPathCol), "left_anti")
      .groupBy(col(ownerCol))
      .agg(count(lit(1)).cast("int").as("n_orphans"),
        sum(col(sizeCol)).as("orphan_bytes"))
}
