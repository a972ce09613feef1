package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Proto

/** Protobuf wire-format census: planted fields replay exactly,
  * the nested flag demands EVERY occurrence reparse, groups must
  * balance, reserved wire types and torn varints refuse, the walk
  * is total.
  */
class ProtoSpec extends AnyFunSuite {

  private def census(b: Array[Byte]) =
    Proto.protoCensus(b).map(_.map(s =>
      (s.field, s.wireType, s.count, s.bytes, s.varintSum,
        s.nested)).toSet)

  test("planted fields census exactly") {
    val w = new Proto.Writer()
    w.int(1, 300)
    w.str(2, "hi")
    w.int(3, 1); w.int(3, 2); w.int(3, 200)
    w.message(4) { m => m.fixed32(1, 7); m.str(2, "n") }
    w.fixed64(5, 42)
    val got = census(w.result()).get
    assert(got == Set(
      (1, 0, 1L, 2L, 300L, false), // 300 needs a 2-byte varint
      // "hi" HAPPENS to reparse (0x68 = field 13 varint key) — the
      // exact ambiguity the census reports rather than hides, and
      // why the oracle query NUL-prefixes its free text
      (2, 2, 1L, 2L, 0L, true),
      (3, 0, 3L, 4L, 203L, false),
      (4, 2, 1L, 8L, 0L, true), // 5 (fixed32) + 3 ("n" str) bytes
      (5, 1, 1L, 8L, 0L, false)))
  }

  test("the nested flag demands every occurrence parse") {
    val w = new Proto.Writer()
    w.message(7) { m => m.int(1, 5) } // parses
    w.bytes(7, Array[Byte](0, 1, 2)) // field 0: can never parse
    val got = census(w.result()).get
    assert(got == Set((7, 2, 2L, 5L, 0L, false)))
    // both parsing -> nested
    val w2 = new Proto.Writer()
    w2.message(7) { m => m.int(1, 5) }
    w2.message(7) { m => m.fixed32(2, 9) }
    assert(census(w2.result()).get.head._6)
  }

  test("groups balance; reserved types, field 0, torn varints " +
      "refuse") {
    // a balanced group pair: key wt=3 then wt=4 on the same walk
    val grp = Array[Byte](0x0b, 0x0c) // field1 start, field1 end
    assert(Proto.protoCensus(grp).isDefined)
    assert(Proto.protoCensus(Array[Byte](0x0b)).isEmpty, "unclosed")
    assert(Proto.protoCensus(Array[Byte](0x0c)).isEmpty, "unopened")
    assert(Proto.protoCensus(Array[Byte](0x06)).isEmpty,
      "reserved wt 6")
    assert(Proto.protoCensus(Array[Byte](0x00, 0x00)).isEmpty,
      "field 0")
    assert(Proto.protoCensus(Array[Byte](0x08)).isEmpty,
      "torn varint")
    assert(Proto.protoCensus(
      Array[Byte](0x12, 0x7f, 0x01)).isEmpty, "length lie")
    assert(Proto.protoCensus(null).isEmpty)
    assert(Proto.protoCensus(Array.emptyByteArray).isEmpty)
  }

  test("census is total under mutation") {
    val w = new Proto.Writer()
    w.int(1, 77); w.str(2, "mutate me " * 20)
    w.message(3) { m => m.int(1, 1) }
    val base = w.result()
    val rnd = new scala.util.Random(0xF0)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Proto.protoCensus(m) // must never throw
    }
  }
}
