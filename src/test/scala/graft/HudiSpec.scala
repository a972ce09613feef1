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
