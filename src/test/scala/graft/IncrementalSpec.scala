package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("processNewParquet reads each file exactly once across runs " +
      "and the manifest ledgers every acceptance") {
    val dir = "/tmp/graft_incr_data"
    val manifest = "graft_test_incr_manifest"
    spark.sql(s"DROP TABLE IF EXISTS $manifest")
    // initial drop: two files
    spark.range(100L).repartition(2)
      .write.mode("overwrite").parquet(dir)
    try {
      var seen = Seq.empty[Long]
      def run(tag: Long): Int =
        Incremental.processNewParquet(spark, dir, manifest, tag) {
          df => seen = seen ++ df.select("id").as[Long].collect()
        }
      assert(run(1L) == 2) // first run: everything is new
      assert(seen.sorted == (0L until 100L))
      assert(run(2L) == 0) // nothing new: process not called
      // a third file lands (write into the same dir, new name)
      spark.range(100L, 150L).coalesce(1)
        .write.mode("append").parquet(dir)
      assert(run(3L) == 1) // only the new file is read
      assert(seen.sorted == (0L until 150L))
      // manifest ledger: 3 rows, batch tags preserved
      val m = spark.table(manifest)
        .select("processed_at").as[Long].collect().sorted
      assert(m.toSeq == Seq(1L, 1L, 3L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $manifest")
    }
  }

  test("newDataFiles with no manifest table returns the full listing") {
    val dir = "/tmp/graft_incr_data2"
    spark.range(10L).coalesce(1).write.mode("overwrite").parquet(dir)
    val fresh = Incremental.newDataFiles(spark, dir,
      "graft_test_incr_nonexistent")
    assert(fresh.count() == 1L)
    assert(fresh.select("bytes").as[Long].head() > 0L)
  }
}
