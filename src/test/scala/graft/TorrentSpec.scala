package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Torrent

/** Bencode + .torrent: canonical-form parsing (unsorted keys,
  * leading zeros, trailing bytes all refuse), the infohash is the
  * SHA-1 of the info dict's exact source span (pinned against a
  * Python-hashlib-computed literal), both file layouts, writer
  * round-trip, mutation totality.
  */
class TorrentSpec extends AnyFunSuite {

  test("infohash matches the hashlib-computed reference literal") {
    // info span: d6:lengthi3e...e inside a hand-written torrent;
    // sha1 computed externally with python hashlib at pin time
    val t = ("d8:announce3:url4:infod6:lengthi3e4:name4:test" +
      "12:piece lengthi16384e6:pieces20:AAAAAAAAAAAAAAAAAAAAee")
      .getBytes("US-ASCII")
    val m = Torrent.torrentMeta(t).get
    assert(m.infohash == "60217806bed0846b12ab654df8cf81fe4ab84ff0")
    assert(m.name == "test" && m.nFiles == 1 &&
      m.totalLength == 3 && m.nPieces == 1 &&
      m.pieceLength == 16384)
  }

  test("writer round-trips both layouts; equal seeds give equal " +
      "infohashes, different seeds differ") {
    val single = Torrent.torrentWrite("one", 16384L, Seq(100000L), 7)
    val m1 = Torrent.torrentMeta(single).get
    assert(m1.nFiles == 1 && m1.totalLength == 100000L)
    assert(m1.nPieces == 7) // ceil(100000/16384)
    val multi = Torrent.torrentWrite("many", 32768L,
      Seq(10L, 20L, 30L), 7)
    val m2 = Torrent.torrentMeta(multi).get
    assert(m2.nFiles == 3 && m2.totalLength == 60L &&
      m2.nPieces == 1)
    assert(Torrent.torrentMeta(
      Torrent.torrentWrite("one", 16384L, Seq(100000L), 7)).get
      .infohash == m1.infohash)
    assert(Torrent.torrentMeta(
      Torrent.torrentWrite("one", 16384L, Seq(100000L), 8)).get
      .infohash != m1.infohash)
  }

  test("canonical form is demanded: unsorted keys, leading zeros, " +
      "trailing bytes, truncation all refuse") {
    def bd(s: String) = Torrent.bdecode(s.getBytes("US-ASCII"))
    assert(bd("d1:bi1e1:ai2ee").isEmpty, "unsorted keys")
    assert(bd("d1:ai1e1:ai2ee").isEmpty, "duplicate keys")
    assert(bd("i01e").isEmpty, "leading zero")
    assert(bd("i-0e").isEmpty, "negative zero")
    assert(bd("i1e ").isEmpty, "trailing bytes")
    assert(bd("5:ab").isEmpty, "short string")
    assert(bd("li1e").isEmpty, "unterminated list")
    assert(bd("").isEmpty)
    assert(Torrent.bdecode(null).isEmpty)
    assert(bd("i1e").exists {
      case Torrent.BInt(1L, 0, 3) => true
      case _ => false
    })
    assert(bd("i-12e").exists {
      case Torrent.BInt(-12L, _, _) => true
      case _ => false
    })
    // a pieces blob that is not a multiple of 20 refuses
    val bad = ("d4:infod6:lengthi3e4:name1:x12:piece lengthi1e" +
      "6:pieces3:abcee").getBytes("US-ASCII")
    assert(Torrent.torrentMeta(bad).isEmpty)
  }

  test("parse is total under mutation") {
    val base = Torrent.torrentWrite("mutate", 16384L,
      Seq(5000L, 6000L), 3)
    val rnd = new scala.util.Random(0xBE)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Torrent.torrentMeta(m) // must never throw
    }
  }
}
