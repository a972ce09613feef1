package graft

import java.nio.file.Files

import graft.operators.Hudi

/** Hudi timeline census (round 18): the instant-name grammar, the
  * inflight-invisibility rule (a reader must never count an
  * in-flight commit's data), the per-partition write-stat census,
  * and kernel totality over malformed bodies.
  */
class HudiSpec extends SparkSpec {

  test("instant names parse: action, state, timestamp; junk " +
      "refuses") {
    assert(Hudi.parseInstant("20240101000003.commit")
      .contains((20240101000003L, "commit", "completed")))
    assert(Hudi.parseInstant("20240101000002.commit.inflight")
      .contains((20240101000002L, "commit", "inflight")))
    assert(Hudi.parseInstant("20240101000001.clean.requested")
      .contains((20240101000001L, "clean", "requested")))
    assert(Hudi.parseInstant("hoodie.properties").isEmpty)
    assert(Hudi.parseInstant("123.commit.bogus").isEmpty)
    assert(Hudi.parseInstant("a.b.c.d").isEmpty)
  }

  test("the planted timeline censuses closed-form; inflight " +
      "commits are invisible") {
    val dir = Files.createTempDirectory("graft_hudi").toString
    Hudi.writeTimeline(dir)
    val rows = Hudi.timelineCensus(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5), r.getLong(6)))
      .toSet
    assert(rows == Set(
      ("p0", 7, 100L, 30000L, 3, 3, 20240101000009L),
      ("p1", 4, 64L, 20004L, 3, 3, 20240101000009L)))
    // the inflight rule is load-bearing: v=2,5,8 wrote nothing
    // visible even though their instants exist on the timeline
    assert(Hudi.plantedCompleted == Seq(0, 1, 3, 4, 6, 7, 9))
  }

  test("HoodieLogFormat block walk (round 19): write/read " +
      "roundtrip, corrupt-block forward recovery, name grammars") {
    val blk = Hudi.logBlockWrite(1, 3, Map(1 -> "7", 2 -> "s"),
      "payload".getBytes("UTF-8"))
    val one = Hudi.logBlocks(blk)
    assert(one.length == 1)
    assert(one.head.version == 1 && one.head.btype == 3)
    assert(one.head.headers == Map(1 -> "7", 2 -> "s"))
    assert(new String(one.head.content, "UTF-8") == "payload")
    // two blocks concatenate; a corrupted middle recovers forward
    val two = Hudi.logBlocks(blk ++ Hudi.logBlockWrite(1, 1,
      Map.empty, "k1,k2".getBytes("UTF-8")))
    assert(two.map(_.btype) == Seq(3, 1))
    val corrupted = {
      val c = (blk ++ blk).clone()
      c(blk.length + 10) = (c(blk.length + 10) ^ 0x7f).toByte
      c
    }
    val rec = Hudi.logBlocks(corrupted)
    assert(rec.head.btype == 3) // first block intact
    assert(rec.exists(_.btype == -1)) // damage surfaced, no crash
    // junk prefix scans forward to the first magic
    val junked = Hudi.logBlocks(
      "garbage".getBytes("UTF-8") ++ blk)
    assert(junked.map(_.btype) == Seq(-1, 3))
    assert(Hudi.logBlocks(null).isEmpty)
    assert(Hudi.logBlocks(Array[Byte](1, 2, 3)).map(_.btype) ==
      Seq(-1))
    // name grammars (spec anchors)
    assert(Hudi.parseBaseName("fg-a_0-0-0_5.parquet")
      .contains(("fg-a", 5L)))
    assert(Hudi.parseBaseName("junk.parquet").isEmpty)
    assert(Hudi.parseBaseName("a_b_c_d.orc").isEmpty)
    assert(Hudi.parseLogName(".fg-a_5.log.2_0-0-0")
      .contains(("fg-a", 5L, 2)))
    assert(Hudi.parseLogName("fg-a_5.log.2_0-0-0").isEmpty)
    assert(Hudi.parseLogName(".fg-a_x.log.2_0").isEmpty)
  }

  test("file-group resolution (round 19): latest completed base " +
      "wins, stale bases counted, inflight bases ignored, stale " +
      "logs never attach") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudimor").toString + "/t"
    Hudi.writeMorTable(dir)
    val got = Hudi.fileGroups(spark, dir).collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7),
        r.getLong(8)))).toMap
    assert(got.keySet == Set("fg-a", "fg-b", "fg-c"))
    // fg-a: base 5 (not the stale 1, not the inflight 9), logs
    // v1+v2 attach, the base-1 log does not
    assert(got("fg-a") == (("p0", 5L, 1, 2, 2, 1, 0, 11L)))
    assert(got("fg-b") == (("p0", 3L, 0, 1, 1, 0, 0, 5L)))
    assert(got("fg-c") == (("p1", 5L, 0, 0, 0, 0, 0, 0L)))
  }

  test("the commit-body kernel is total over malformed JSON") {
    assert(Hudi.writeStats("not json").isEmpty)
    assert(Hudi.writeStats("[1,2]").isEmpty)
    assert(Hudi.writeStats("""{"partitionToWriteStats": 7}""")
      .isEmpty)
    assert(Hudi.writeStats(
      """{"partitionToWriteStats": {"p0": [{"numWrites": 1.5,
         "totalWriteBytes": 3}]}}""").isEmpty) // non-integral
    assert(Hudi.writeStats(
      """{"partitionToWriteStats": {"p0": [{"numWrites": 2,
         "totalWriteBytes": 3}]}}""") == Seq(("p0", 2L, 3L)))
  }
}
