package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level incremental batch processing — the standard
  * recurring-ingest pattern for a directory that crawlers keep
  * appending to: a persistent MANIFEST table records every data file
  * already processed, and each run reads only the difference. Unlike
  * Structured Streaming's file source this works for plain batch
  * jobs, survives arbitrary gaps between runs, and the manifest is an
  * ordinary queryable table (auditable, repairable, joinable with
  * [[Layout.fileAudit]] output).
  *
  * Scale shape: the listing is file-count-sized (see
  * [[Layout.fileList]]) and the anti-join runs over file PATHS — data
  * bytes are only touched for genuinely new files, read via an
  * explicit path list so no reprocessed file is ever re-scanned.
  *
  * Idempotence contract: mark files processed ONLY after their
  * output commits (call [[markProcessed]] with exactly the frame
  * [[newDataFiles]] returned). A crashed run re-lists the same files
  * next time — at-least-once, the right default for append-only
  * curation sinks that dedup downstream (C1/C38 machinery).
  */
object Incremental {

  /** Data files under `dataPath` not yet recorded in
    * `manifestTable`: (`file`, `bytes`). A missing manifest table
    * (first ever run) means everything is new.
    */
  def newDataFiles(spark: SparkSession, dataPath: String,
      manifestTable: String): DataFrame = {
    val listed = Layout.fileList(spark, dataPath)
    if (!spark.catalog.tableExists(manifestTable)) listed
    else listed.join(spark.table(manifestTable).select("file"),
      Seq("file"), "left_anti")
  }

  /** Record `files` (a frame with a `file` column, normally the one
    * [[newDataFiles]] returned) as processed — append-only, so the
    * manifest doubles as an ingest ledger with one row per file ever
    * accepted plus its `bytes` and `processed_at` epoch batch tag.
    */
  def markProcessed(spark: SparkSession, files: DataFrame,
      manifestTable: String, batchTag: Long): Unit =
    files.select(col("file"), col("bytes"),
        lit(batchTag).as("processed_at"))
      .write.mode("append").format("parquet")
      .saveAsTable(manifestTable)

  /** One incremental run: list the new files, read them as parquet
    * (explicit path list — nothing already processed is re-scanned),
    * hand the rows to `process`, and mark the files only after it
    * returns. Returns the number of files accepted this run (0 =
    * nothing new, `process` not called).
    */
  def processNewParquet(spark: SparkSession, dataPath: String,
      manifestTable: String, batchTag: Long)
      (process: DataFrame => Unit): Int = {
    val fresh = newDataFiles(spark, dataPath, manifestTable)
      .localCheckpoint() // pin the listing: process + mark see one set
    val paths = fresh.select("file")
      .collect().map(_.getString(0)).sorted
    if (paths.nonEmpty) {
      // basePath keeps Hive-style partition columns (dir=value) that
      // an explicit leaf-path read would otherwise silently drop
      process(spark.read.option("basePath", dataPath)
        .parquet(paths: _*))
      markProcessed(spark, fresh, manifestTable, batchTag)
    }
    paths.length
  }
}
