package graft

import graft.operators.Maintenance

/** Maintenance planning: next-fit bin assignment matches the
  * hand-computed packing (including the cross-boundary file rule
  * and per-partition independence); the orphan sweep keeps exactly
  * the unreferenced paths and drops fully-referenced owners.
  */
class MaintenanceSpec extends SparkSpec {

  test("compactionPlan: next-fit by exclusive-prefix bytes, " +
      "independent per partition") {
    import spark.implicits._
    val files = Seq(
      ("a", 600L, 1L), ("a", 600L, 2L), ("a", 600L, 3L),
      ("b", 100L, 1L))
      .toDF("part", "size", "ord")
    val plan = Maintenance.compactionPlan(files, "part", "size",
        "ord", target = 1024L)
      .orderBy("part", "bin").collect()
    // a: prefixes 0/600/1200 -> bins 0,0,1
    assert(plan.length == 3)
    assert(plan(0).getString(0) == "a" && plan(0).getLong(1) == 0 &&
      plan(0).getInt(2) == 2 && plan(0).getLong(3) == 1200 &&
      !plan(0).getBoolean(4))
    assert(plan(1).getString(0) == "a" && plan(1).getLong(1) == 1 &&
      plan(1).getInt(2) == 1 && plan(1).getLong(3) == 600 &&
      !plan(1).getBoolean(4)) // 600 >= target/2
    assert(plan(2).getString(0) == "b" && plan(2).getLong(1) == 0 &&
      plan(2).getInt(2) == 1 && plan(2).getLong(3) == 100 &&
      plan(2).getBoolean(4)) // undersized tail
  }

  test("compactionApply: content-preserving rewrite, one file " +
      "per planned bin (round 18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 files in part a (400+400+400 rows, target 500 → bins
    // 0,0,1), 1 file in part b
    val data = ((1 to 1200).map(i =>
        ("a", (i % 3).toLong, i.toLong)) ++
      (1 to 50).map(i => ("b", 0L, i.toLong)))
      .toDF("part", "file_id", "v")
    val census = data.groupBy($"part", $"file_id")
      .agg(count(lit(1)).cast("bigint").as("n_rows"))
    val assign = Maintenance.compactionAssign(census, "part",
      "n_rows", "file_id", target = 500L)
    val got = assign.orderBy("part", "file_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 0L, 0L), ("a", 1L, 0L),
      ("a", 2L, 1L), ("b", 0L, 0L)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_capply").toString + "/out"
    Maintenance.compactionApply(data, "part", "file_id", assign, dir)
    val rb = spark.read.parquet(dir)
    // content preserved exactly
    val sums = rb.groupBy("part")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet
    assert(sums == Set(("a", 1200L, 1200L * 1201 / 2),
      ("b", 50L, 50L * 51 / 2)))
    // one physical file per planned bin
    val files = rb.withColumn("__f", input_file_name())
      .groupBy("part")
      .agg(countDistinct(col("__f")).as("nf"),
        countDistinct(col("bin")).as("nb"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet
    assert(files == Set(("a", 2L, 2L), ("b", 1L, 1L)))
    // the rewrite's shuffle shape at any scale: with the (tiny)
    // assignment materialized — as a table service would — the
    // data path is a BROADCAST join plus exactly ONE hash exchange
    // co-locating the bins; a sort-merge join or a second exchange
    // here would be the 100 TB bottleneck
    val assignRows = spark.createDataFrame(
      spark.sparkContext.parallelize(
        assign.select("part", "file_id", "bin").collect().toSeq, 1),
      assign.select("part", "file_id", "bin").schema)
    val plan = Maintenance.compactionRewrite(data, "part",
      "file_id", assignRows).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val nExchanges = "(?<!Broadcast)Exchange".r
      .findAllIn(plan).length
    assert(nExchanges == 1,
      s"expected ONE hash exchange, got $nExchanges:\n$plan")
  }

  test("clusteringDepth: the boundary sweep computes exact max " +
      "depth and the depth integral per partition") {
    import spark.implicits._
    // partition a: [0,10], [5,20], [15,30] — depth profile:
    // [0,5)=1 [5,11)=2 [11,15)=1 [15,21)=2 [21,31)=1
    // partition b: [0,9], [20,29] — disjoint, depth 1 throughout
    val files = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 15L, 30L),
      ("b", 0L, 9L), ("b", 20L, 29L))
      .toDF("part", "lo", "hi")
    val got = Maintenance.clusteringDepth(files, "part", "lo", "hi")
      .orderBy("part").collect()
    assert(got.length == 2)
    val a = got(0)
    assert(a.getString(0) == "a" && a.getInt(1) == 2)
    // area = 5*1 + 6*2 + 4*1 + 6*2 + 10*1 = 43 over span 31
    assert(a.getLong(2) == 43L && a.getLong(3) == 31L &&
      a.getInt(4) == 6)
    val bRow = got(1)
    assert(bRow.getString(0) == "b" && bRow.getInt(1) == 1)
    // area = 10 + 10 (the gap [10,20) contributes 0 depth, 10 span)
    assert(bRow.getLong(2) == 20L && bRow.getLong(3) == 30L)
  }

  test("orphanFiles: anti join keeps exactly the unreferenced; " +
      "fully-referenced owners vanish") {
    import spark.implicits._
    val listing = Seq(
      (1L, "f1-0", 10L), (1L, "f1-1", 11L), (1L, "f1-2", 12L),
      (2L, "f2-0", 20L))
      .toDF("owner", "path", "size")
    val referenced = Seq("f1-0", "f2-0").toDF("ref_path")
    val got = Maintenance.orphanFiles(listing, "path", "size",
        "owner", referenced, "ref_path")
      .orderBy("owner").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getInt(1) == 2 &&
      got(0).getLong(2) == 23L)
  }
}
