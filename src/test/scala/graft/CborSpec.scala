package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cbor

/** CBOR census: RFC 8949 APPENDIX A test vectors — the reference
  * vectors published in the standard itself — replay byte-for-byte
  * from the document's hex column; the writer round-trips; the
  * RFC's well-formedness rules (stray break, short two-byte
  * simple, reserved additional info, trailing bytes, mixed
  * indefinite chunk types) refuse; the walk is total.
  */
class CborSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("RFC 8949 Appendix A vectors replay") {
    // (hex, kind, n_items, n_nodes, depth, tags, indefinite)
    val vectors = Seq(
      ("00", "uint", None, 1L, 0, 0L, false),
      ("1818", "uint", None, 1L, 0, 0L, false),
      ("1a000f4240", "uint", None, 1L, 0, 0L, false),
      ("1b000000e8d4a51000", "uint", None, 1L, 0, 0L, false),
      ("20", "negint", None, 1L, 0, 0L, false),
      ("3863", "negint", None, 1L, 0, 0L, false),
      ("4401020304", "bytes", Some(4L), 1L, 0, 0L, false),
      ("6449455446", "text", Some(4L), 1L, 0, 0L, false),
      ("80", "array", Some(0L), 1L, 0, 0L, false),
      ("83010203", "array", Some(3L), 4L, 1, 0L, false),
      ("8301820203820405", "array", Some(3L), 8L, 2, 0L, false),
      ("98190102030405060708090a0b0c0d0e0f1011121314151617" +
        "18181819", "array", Some(25L), 26L, 1, 0L, false),
      ("a201020304", "map", Some(2L), 5L, 1, 0L, false),
      ("a26161016162820203", "map", Some(2L), 7L, 2, 0L, false),
      ("c074323031332d30332d32315432303a30343a30305a",
        "tag", None, 2L, 1, 1L, false),
      ("c249010000000000000000", "tag", None, 2L, 1, 1L, false),
      ("f4", "simple", None, 1L, 0, 0L, false),
      ("f5", "simple", None, 1L, 0, 0L, false),
      ("f6", "simple", None, 1L, 0, 0L, false),
      ("f7", "simple", None, 1L, 0, 0L, false),
      ("f90000", "simple", None, 1L, 0, 0L, false),
      ("fb3ff199999999999a", "simple", None, 1L, 0, 0L, false),
      ("7f657374726561646d696e67ff", "text", Some(9L), 1L, 0, 0L,
        true),
      ("5f42010243030405ff", "bytes", Some(5L), 1L, 0, 0L, true),
      ("9fff", "array", Some(0L), 1L, 0, 0L, true),
      ("9f018202039f0405ffff", "array", Some(3L), 8L, 2, 0L, true),
      ("bf61610161629f0203ffff", "map", Some(2L), 7L, 2, 0L, true),
      ("826161a161626163", "array", Some(2L), 5L, 2, 0L, false))
    vectors.foreach { case (h, kind, items, nodes, d, tags, ind) =>
      val f = Cbor.cborCensus(hex(h)).get
      assert(f.topKind == kind, h)
      assert(f.nItems == items, h)
      assert(f.nNodes == nodes, h)
      assert(f.maxDepth == d, h)
      assert(f.nTags == tags, h)
      assert(f.hasIndefinite == ind, h)
    }
  }

  test("well-formedness violations refuse") {
    assert(Cbor.cborCensus(null).isEmpty)
    assert(Cbor.cborCensus(Array.emptyByteArray).isEmpty)
    assert(Cbor.cborCensus(hex("ff")).isEmpty) // stray break
    assert(Cbor.cborCensus(hex("f818")).isEmpty) // simple < 32
    assert(Cbor.cborCensus(hex("1c")).isEmpty) // reserved ai 28
    assert(Cbor.cborCensus(hex("0000")).isEmpty) // trailing bytes
    assert(Cbor.cborCensus(hex("8301")).isEmpty) // truncated array
    // indefinite text with a BYTES chunk (mixed types) refuses
    assert(Cbor.cborCensus(hex("7f4101ff")).isEmpty)
    // indefinite chunk that is itself indefinite refuses
    assert(Cbor.cborCensus(hex("7f7fffff")).isEmpty)
  }

  test("the writer round-trips planted closed forms") {
    val w = new Cbor.Writer
    w.mapHead(2L).text("a").uint(1L).text("b").uint(2L)
    val m = Cbor.cborCensus(w.result()).get
    assert(m.topKind == "map" && m.nItems.contains(2L) &&
      m.nNodes == 5 && m.maxDepth == 1)
    val w2 = new Cbor.Writer
    w2.indefArrayHead().text("x").text("y").break()
    val a = Cbor.cborCensus(w2.result()).get
    assert(a.topKind == "array" && a.nItems.contains(2L) &&
      a.hasIndefinite)
  }

  test("the census is total over mutated bytes") {
    val base = {
      val w = new Cbor.Writer
      w.arrayHead(3L).tag(0L).text("2026-01-05")
        .mapHead(1L).text("k").uint(7L).bytes(6)
      w.result()
    }
    val rnd = new scala.util.Random(232)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Cbor.cborCensus(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      Cbor.cborCensus(base.take(rnd.nextInt(base.length)))
    }
  }
}
