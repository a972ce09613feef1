package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MsgPack

/** MessagePack census: the spec's own README example replays
  * byte-for-byte; the writer round-trips; 0xc1 (never-used), torn
  * containers and trailing bytes refuse; the walk is total.
  */
class MsgPackSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("the spec README example replays byte-for-byte") {
    // {"compact":true,"schema":0} — the msgpack.org example, 18B
    val b = hex("82a7636f6d70616374c3a6736368656d6100")
    assert(b.length == 18)
    val f = MsgPack.mpCensus(b).get
    assert(f.topKind == "map" && f.nItems.contains(2L) &&
      f.nNodes == 5 && f.maxDepth == 1 && f.nExts == 0)
  }

  test("every format family walks: sized ints, strs, bins, exts") {
    // [127, -32, u8 255, i64, str8, bin8, fixext8, float64]
    val b = hex("98" + "7f" + "e0" + "ccff" +
      "d30000000000000000" +
      "d903616263" + "c403010203" + "d7ff0000000000000000" +
      "cb3ff199999999999a")
    val f = MsgPack.mpCensus(b).get
    assert(f.topKind == "array" && f.nItems.contains(8L) &&
      f.nNodes == 9 && f.nExts == 1)
  }

  test("violations refuse: 0xc1, torn containers, trailing") {
    assert(MsgPack.mpCensus(null).isEmpty)
    assert(MsgPack.mpCensus(Array.emptyByteArray).isEmpty)
    assert(MsgPack.mpCensus(hex("c1")).isEmpty)
    assert(MsgPack.mpCensus(hex("92010203")).isEmpty) // trailing
    assert(MsgPack.mpCensus(hex("9201")).isEmpty) // torn array
    assert(MsgPack.mpCensus(hex("a3616263" + "00")).isEmpty)
    assert(MsgPack.mpCensus(hex("d9")).isEmpty) // torn str8
  }

  test("the writer round-trips planted closed forms") {
    val w = new MsgPack.Writer
    w.mapHead(2).str("k0").int(41L).str("k1").int(-5L)
    val m = MsgPack.mpCensus(w.result()).get
    assert(m.topKind == "map" && m.nItems.contains(2L) &&
      m.nNodes == 5 && m.maxDepth == 1)
    val w2 = new MsgPack.Writer
    w2.mapHead(1).str("ts").fixext4(0xff)
    val e = MsgPack.mpCensus(w2.result()).get
    assert(e.nExts == 1 && e.nNodes == 3)
  }

  test("the census is total over mutated bytes") {
    val base = {
      val w = new MsgPack.Writer
      w.arrayHead(3)
        .str("abc").int(1234567L)
      w.mapHead(1).str("x").bool(true)
      w.result()
    }
    val rnd = new scala.util.Random(233)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      MsgPack.mpCensus(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      MsgPack.mpCensus(base.take(rnd.nextInt(base.length)))
    }
  }
}
