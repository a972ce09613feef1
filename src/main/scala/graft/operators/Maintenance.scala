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
      // prefix fills; integer division keeps it closed-form
      .withColumn("bin",
        ((col("__cum") - col(sizeCol)) / lit(target))
          .cast("bigint"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).cast("int").as("n_files"),
        sum(col(sizeCol)).as("bytes"))
      .withColumn("undersized", col("bytes") < lit(target / 2))
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
