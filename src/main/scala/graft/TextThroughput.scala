package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured serving throughput for the persistent inverted text index
  * (diagnostic main, not part of the bench): build the
  * [[graft.operators.TextIndex]] once over the sf documents, then
  * serve repeated query batches against it and report batches/s and
  * queries/s — the number that shows the build-once/serve-many trade
  * paying off against the per-call [[graft.operators.Retrieval]]
  * corpus scan (also timed, for the ratio). README records the
  * current figures.
  *
  * Usage: `sbt "runMain graft.TextThroughput"` (env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_TEXT_EPOCHS /
  * SPARK_GRAFT_TEXT_BATCH override).
  */
object TextThroughput {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val epochs = sys.env.getOrElse("SPARK_GRAFT_TEXT_EPOCHS", "10").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_TEXT_BATCH", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = "graft_text_tp_idx"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    graft.operators.TextIndex.build(docs, "doc_id", "text", table,
      buckets = 64)
    val buildS = (System.nanoTime() - t0) / 1e9

    // query batches: 6-token prefixes of rotating document slices —
    // every epoch a different slice so nothing is result-cached.
    // slices floors at 1 (tiny corpora: divisor 0 would null-filter
    // everything) and the rotation modulus never exceeds the slice
    // count (aliasing guard).
    val slices = math.max(1L, nDocs / batch)
    val rotation = math.min(7L, slices).toInt
    def batchDf(epoch: Int) = docs
      .filter(col("doc_id") % lit(slices) === (epoch % rotation))
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(
          graft.functions.TextFunctions.tokens(col("text")), 1, 6))
          .as("qtext"))

    // one warm epoch (catalog/codegen init), then timed epochs
    graft.operators.TextIndex.query(spark, table, batchDf(0),
      "query_id", "qtext", k = 10).count()
    var served = 0L
    val t1 = System.nanoTime()
    for (e <- 1 to epochs) {
      served += graft.operators.TextIndex.query(spark, table,
        batchDf(e % 7), "query_id", "qtext", k = 10)
        .select("query_id").distinct().count()
    }
    val serveS = (System.nanoTime() - t1) / 1e9

    // the per-call scan path on the same batch, for the ratio
    val t2 = System.nanoTime()
    graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
      batchDf(1), "query_id", "qtext", k = 10).count()
    val scanS = (System.nanoTime() - t2) / 1e9

    println(f"text-index build: $nDocs docs in $buildS%.1f s; " +
      f"serve: $epochs epochs, $served queries answered in " +
      f"$serveS%.1f s (${epochs / serveS}%.1f batches/s, " +
      f"${served / serveS}%.0f q/s); " +
      f"one scan-path call: $scanS%.2f s")
    spark.stop()
  }
}
