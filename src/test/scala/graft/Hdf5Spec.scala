package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hdf5

/** HDF5 superblock triage: the lookup3 core replays the test
  * vectors PUBLISHED in Bob Jenkins' lookup3.c itself; both
  * superblock generations round-trip; a torn file surfaces its
  * EOF-address lie; a checksum lie surfaces; damage refuses;
  * the walk is total.
  */
class Hdf5Spec extends AnyFunSuite {

  test("lookup3 replays the vectors published in lookup3.c") {
    def h(s: String, init: Long): Long =
      Hdf5.hashlittle(s.getBytes("US-ASCII"), s.length, init)
    assert(h("", 0L) == 0xdeadbeefL)
    assert(h("", 0xdeadbeefL) == 0xbd5b7ddeL)
    assert(h("Four score and seven years ago", 0L) == 0x17770551L)
    assert(h("Four score and seven years ago", 1L) == 0xcd628161L)
  }

  test("both superblock generations round-trip") {
    val v0 = Hdf5.h5Meta(Hdf5.h5Write(0, 40)).get
    assert(v0.version == 0 && v0.offsetSize == 8 &&
      v0.lengthSize == 8)
    assert(v0.eofMatches && v0.checksumOk.isEmpty)
    val v3 = Hdf5.h5Meta(Hdf5.h5Write(3, 40)).get
    assert(v3.version == 3 && v3.eofMatches &&
      v3.checksumOk.contains(true))
  }

  test("a torn file surfaces the EOF lie; a checksum lie " +
      "surfaces") {
    val torn = Hdf5.h5Write(3, 40).dropRight(7)
    val m = Hdf5.h5Meta(torn).get
    assert(!m.eofMatches && m.checksumOk.contains(true))
    val lied = Hdf5.h5Write(3, 40)
    lied(45) = (lied(45) ^ 0x10).toByte // checksum byte
    val l = Hdf5.h5Meta(lied).get
    assert(l.checksumOk.contains(false))
    // a superblock-field flip makes the checksum catch it
    val flipped = Hdf5.h5Write(3, 40)
    flipped(13) = (flipped(13) ^ 1).toByte // base address byte
    assert(Hdf5.h5Meta(flipped).get.checksumOk.contains(false))
  }

  test("damage refuses; the walk is total") {
    assert(Hdf5.h5Meta(null).isEmpty)
    assert(Hdf5.h5Meta("HDF".getBytes("ISO-8859-1")).isEmpty)
    val badVer = Hdf5.h5Write(3, 10); badVer(8) = 9
    assert(Hdf5.h5Meta(badVer).isEmpty)
    val badSize = Hdf5.h5Write(3, 10); badSize(9) = 1
    assert(Hdf5.h5Meta(badSize).isEmpty)
    val bases = Seq(Hdf5.h5Write(0, 30), Hdf5.h5Write(3, 30))
    val rnd = new scala.util.Random(244)
    bases.foreach { base =>
      (0 until 150).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        Hdf5.h5Meta(m) // must not throw
      }
      (0 until 30).foreach { _ =>
        Hdf5.h5Meta(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
