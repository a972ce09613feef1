package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Io

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with ZERO exchange") {
    // default (gitignored) warehouse dir — warehouse.dir is static conf
    val dir = Files.createTempDirectory("graft_bkt").toString
    val facts = (1L to 10000L).map(i => (i % 500, i * 3))
      .toDF("k", "v1")
    val dims = (1L to 2000L).map(i => (i % 500, i.toString))
      .toDF("k", "v2")
    Io.writeBucketed(facts, "bkt_facts", "k", 8, sortCol = Some("k"))
    Io.writeBucketed(dims, "bkt_dims", "k", 8, sortCol = Some("k"))
    // force the non-broadcast path so the join would OTHERWISE shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000L * 4) // 20 facts x 4 dims per key
      // control: the same join over unbucketed parquet shuffles
      val pf = s"$dir/plain_facts"; val pd = s"$dir/plain_dims"
      facts.write.mode("overwrite").parquet(pf)
      dims.write.mode("overwrite").parquet(pd)
      val plain = spark.read.parquet(pf)
        .join(spark.read.parquet(pd), Seq("k"))
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("bucketed aggregation on the bucket key is shuffle-free") {
    val facts = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "v")
    Io.writeBucketed(facts, "bkt_agg_t", "k", 4)
    try {
      val agg = spark.table("bkt_agg_t").groupBy("k")
        .agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed agg must not shuffle:\n$plan")
      assert(agg.count() == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_agg_t")
    }
  }
}
