package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeltaLog

/** Delta commit-log census: a protocol-doc-shaped literal replays
  * exactly; the writer round-trips; unknown actions count without
  * guessing (the protocol's forward-compat rule); corrupt lines
  * refuse the blob; the census is total.
  */
class DeltaLogSpec extends AnyFunSuite {

  test("a protocol-shaped commit replays exactly") {
    val log = DeltaLog.deltaWrite(Seq(1024L, 2048L, 512L), 2,
      Seq("date", "region"))
    val f = DeltaLog.deltaFacts(log).get
    assert(f.nActions == 8) // commitInfo+protocol+metaData+3a+2r
    assert(f.nAdd == 3 && f.nRemove == 2 && f.nOther == 1)
    assert(f.addBytes == 3584L)
    assert(f.nPartitionCols == 2)
    assert(f.minReader == 1 && f.minWriter == 2)
    assert(f.provider == "parquet")
  }

  test("unknown actions count without guessing") {
    val log = DeltaLog.deltaWrite(Seq(10L), 0, Seq.empty) +
      """{"cdc":{"path":"c.parquet","size":5}}""" + "\n" +
      """{"domainMetadata":{"domain":"x","configuration":""}}"""
    val f = DeltaLog.deltaFacts(log).get
    assert(f.nAdd == 1 && f.nOther == 3) // commitInfo + 2 unknown
  }

  test("corrupt lines refuse the blob") {
    val good = DeltaLog.deltaWrite(Seq(10L), 1, Seq("p"))
    assert(DeltaLog.deltaFacts(good).isDefined)
    assert(DeltaLog.deltaFacts(null).isEmpty)
    assert(DeltaLog.deltaFacts("").isEmpty)
    assert(DeltaLog.deltaFacts(good + "{oops").isEmpty)
    // two actions in one line violates the protocol
    assert(DeltaLog.deltaFacts(
      """{"add":{"size":1},"remove":{"path":"x"}}""").isEmpty)
    // an add without a size is a lie
    assert(DeltaLog.deltaFacts(
      """{"add":{"path":"x.parquet"}}""").isEmpty)
    // a bare array line is not an action
    assert(DeltaLog.deltaFacts("[1,2,3]").isEmpty)
  }

  test("the census is total over mutated text") {
    val base = DeltaLog.deltaWrite(Seq(100L, 200L), 1, Seq("d"))
    val rnd = new scala.util.Random(236)
    (0 until 150).foreach { _ =>
      val chars = base.toCharArray
      (0 to rnd.nextInt(3)).foreach { _ =>
        chars(rnd.nextInt(chars.length)) =
          (32 + rnd.nextInt(95)).toChar
      }
      DeltaLog.deltaFacts(new String(chars)) // must not throw
    }
    (0 until 30).foreach { _ =>
      DeltaLog.deltaFacts(base.take(rnd.nextInt(base.length)))
    }
  }
}
