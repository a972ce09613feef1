package graft

import java.nio.file.{Files, Paths}

import graft.operators.DeltaLog

/** Delta CHECKPOINT parquet (round 18): the checkpoint-rooted
  * snapshot (_last_checkpoint → checkpoint parquet → JSON tail)
  * must reconcile EXACTLY against the full raw-JSON replay on the
  * planted table, the file layout must match the protocol's naming,
  * and the tail-line kernel must refuse malformed actions.
  */
class DeltaCheckpointSpec extends SparkSpec {

  test("checkpoint-rooted snapshot == full JSON replay == the " +
      "planted closed-form live set") {
    val dir = Files.createTempDirectory("graft_dckpt").toString
    DeltaLog.writeCheckpointedTable(spark, dir)
    val viaCkpt = DeltaLog.snapshotFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaJson = DeltaLog.replayFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = DeltaLog.plantedLive(9).toSet
    assert(viaCkpt == want)
    assert(viaJson == want)
    // protocol layout: zero-padded commit names, the checkpoint
    // parquet at its version, the _last_checkpoint pointer
    val log = Paths.get(dir, "_delta_log")
    assert(Files.exists(log.resolve("00000000000000000000.json")))
    assert(Files.exists(log.resolve("00000000000000000009.json")))
    assert(Files.exists(
      log.resolve("00000000000000000006.checkpoint.parquet")))
    val lc = Files.readString(log.resolve("_last_checkpoint"))
    assert(lc.contains("\"version\":6"))
    // the checkpoint really is read as PARQUET (not replayed from
    // JSON): drop the pre-checkpoint commits and the snapshot must
    // still reconstruct
    (0 to 6).foreach(v =>
      Files.delete(log.resolve(f"$v%020d.json")))
    val truncated = DeltaLog.snapshotFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(truncated == want)
  }

  test("the planted arithmetic: adds, removes, live-set algebra") {
    assert(DeltaLog.plantedAdds(0) == Seq(("f-0-0.parquet", 100L)))
    assert(DeltaLog.plantedAdds(5).map(_._1) ==
      Seq("f-5-0.parquet", "f-5-1.parquet"))
    assert(DeltaLog.plantedRemove(1).isEmpty)
    assert(DeltaLog.plantedRemove(9).contains("f-7-0.parquet"))
    val live = DeltaLog.plantedLive(9).map(_._1).toSet
    assert(!live("f-3-0.parquet")) // removed by v5
    assert(live("f-8-0.parquet")) // never removed
    assert(live("f-3-1.parquet")) // only j=0 files are removed
  }

  test("time travel replays the state as of every version; " +
      "vacuum splits tombstones at the retention cutoff " +
      "(round 18)") {
    val dir = Files.createTempDirectory("graft_dtt").toString
    DeltaLog.writeCheckpointedTable(spark, dir)
    val tt = DeltaLog.timeTravel(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // hand-computed anchors: v0 = one file of 100 bytes; v2 adds
    // 3 files (300+301+302) and removes f-0-0 (100)
    assert(tt(0L) == ((1L, 100L)))
    assert(tt(1L) == ((3L, 100L + 200L + 201L)))
    assert(tt(2L) == ((5L, 200L + 201L + 300L + 301L + 302L)))
    // the final version equals the live reconciliation
    val live = DeltaLog.plantedLive(9)
    assert(tt(9L) == ((live.length.toLong, live.map(_._2).sum)))
    val vac = DeltaLog.vacuumPlan(spark, dir, 1700000005500L)
      .collect().map(r => (r.getBoolean(0), r.getInt(1),
        r.getLong(2))).toSet
    assert(vac == Set((true, 4, 1000L), (false, 4, 2600L)))
  }

  test("V2 checkpoint (sidecar layout, round 19): the top file " +
      "carries only non-file actions + sidecar pointers; the " +
      "adds/removes live in _sidecars/ parquets — and the " +
      "snapshot still reconstructs the planted live set") {
    val dir = Files.createTempDirectory("graft_dckpt2").toString
    DeltaLog.writeCheckpointedTableV2(spark, dir)
    val log = Paths.get(dir, "_delta_log")
    // layout: no classic checkpoint, a uuid-named top, 2 sidecars
    assert(!Files.exists(
      log.resolve("00000000000000000006.checkpoint.parquet")))
    assert(Files.list(log.resolve("_sidecars")).count() == 2)
    val viaCkpt = DeltaLog.snapshotFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaCkpt == DeltaLog.plantedLive(9).toSet)
    // the sidecars really are read as PARQUET (not replayed from
    // JSON): drop the pre-checkpoint commits, snapshot holds
    (0 to 6).foreach(v =>
      Files.delete(log.resolve(f"$v%020d.json")))
    val truncated = DeltaLog.snapshotFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(truncated == DeltaLog.plantedLive(9).toSet)
  }

  test("last-action-wins replay: a remove followed by a later " +
      "re-add keeps the path (the protocol's versioned " +
      "reconciliation, r18 ADVICE); kind-only commits still " +
      "appear in the AS OF listing") {
    val dir = Files.createTempDirectory("graft_dreadd").toString
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    def w(v: Int, lines: String*): Unit =
      Files.writeString(log.resolve(f"$v%020d.json"),
        lines.mkString("\n") + "\n")
    val ci = """{"commitInfo":{"operation":"WRITE","timestamp":1}}"""
    def add(p: String, sz: Long) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":$sz,""" +
        s""""modificationTime":1,"dataChange":true}}"""
    def rem(p: String) =
      s"""{"remove":{"path":"$p","deletionTimestamp":2,""" +
        s""""dataChange":true}}"""
    w(0, ci, add("a.parquet", 10), add("b.parquet", 20))
    w(1, ci, rem("a.parquet"))
    w(2, ci, add("a.parquet", 30)) // the re-add a bare anti join kills
    w(3, ci)                       // kind-only commit (metadata only)
    val live = DeltaLog.replayFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(live == Set(("a.parquet", 30L), ("b.parquet", 20L)))
    // the checkpoint-rooted path agrees: checkpoint at v1 (state =
    // {b}), tail v2..3 re-adds a
    val ckptRows = Seq(
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row("b.parquet", 20L, true),
        null, null, null),
      org.apache.spark.sql.Row(null,
        org.apache.spark.sql.Row("a.parquet"), null, null))
    import org.apache.spark.sql.types._
    val ckptSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType))))))
    val tmp = dir + "/_ckpt_tmp"
    spark.createDataFrame(
        spark.sparkContext.parallelize(ckptRows, 1), ckptSchema)
      .write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part,
      log.resolve("00000000000000000001.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"),
      """{"version":1,"size":2}""")
    val viaCkpt = DeltaLog.snapshotFiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaCkpt == Set(("a.parquet", 30L), ("b.parquet", 20L)))
    // time travel lists ALL four versions — v3 carries no add or
    // remove but still advances the table state unchanged
    val tt = DeltaLog.timeTravel(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(tt.keySet == Set(0L, 1L, 2L, 3L))
    assert(tt(0L) == ((2L, 30L)))
    assert(tt(1L) == ((1L, 20L)))
    assert(tt(2L) == ((2L, 50L)))
    assert(tt(3L) == ((2L, 50L)))
  }

  test("tail-line kernel: actions map, junk refuses") {
    assert(DeltaLog.actionPathSize(
      """{"add":{"path":"p.parquet","size":10,"dataChange":true}}""")
      .contains(("add", "p.parquet", 10L)))
    assert(DeltaLog.actionPathSize(
      """{"remove":{"path":"p.parquet"}}""")
      .contains(("remove", "p.parquet", -1L)))
    assert(DeltaLog.actionPathSize(
      """{"commitInfo":{"operation":"WRITE"}}""")
      .contains(("commitInfo", "", -1L)))
    // two actions on one line / non-object / junk → refuse
    assert(DeltaLog.actionPathSize(
      """{"add":{"path":"a"},"remove":{"path":"b"}}""").isEmpty)
    assert(DeltaLog.actionPathSize("[1,2]").isEmpty)
    assert(DeltaLog.actionPathSize("not json").isEmpty)
    // the tombstone kernel: removes with integral timestamps map,
    // everything else refuses
    assert(DeltaLog.removeTombstone(
      """{"remove":{"path":"p","deletionTimestamp":1700000002000,""" +
      """"dataChange":true}}""").contains(("p", 1700000002000L)))
    assert(DeltaLog.removeTombstone(
      """{"add":{"path":"p","size":1}}""").isEmpty)
    assert(DeltaLog.removeTombstone(
      """{"remove":{"path":"p"}}""").isEmpty)
    assert(DeltaLog.removeTombstone("junk").isEmpty)
    // protocol forward-compat: an add carrying a deletionVector
    // descriptor (the DV tier of DeletionVectors.scala) must still
    // parse — unknown body fields are tolerated, never refused
    assert(DeltaLog.actionPathSize(
      """{"add":{"path":"p.parquet","size":10,"dataChange":true,""" +
      """"deletionVector":{"storageType":"u","pathOrInlineDv":""" +
      """"ab^-c","offset":1,"sizeInBytes":36,"cardinality":2}}}""")
      .contains(("add", "p.parquet", 10L)))
  }
}
