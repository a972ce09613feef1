package graft.operators

import org.apache.spark.sql.SparkSession

/** Managed-table housekeeping for index builders. A rebuild from a NEW
  * session (fresh in-memory catalog) must still be able to overwrite a
  * previous run's table: `saveAsTable(mode=overwrite)` only overwrites
  * tables the CURRENT catalog knows, and fails with
  * LOCATION_ALREADY_EXISTS on an orphaned warehouse directory left by
  * an earlier process. Dropping both the catalog entry and the physical
  * location makes index builds idempotent across sessions.
  */
private[graft] object Warehouse {

  def dropManaged(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
  }
}
