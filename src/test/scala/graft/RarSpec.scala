package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rar

/** RAR5 walk: the from-spec stored-member writer round-trips (and
  * is listed/extracted byte-exactly by libarchive's independent
  * rar5 reader — recorded at generation time by RarPinGen), data
  * CRC lies refuse the member, compressed methods refuse honestly,
  * torn archives refuse, the walk is total.
  */
class RarSpec extends AnyFunSuite {

  test("stored members round-trip with verified data CRCs") {
    val members = Seq(
      ("a.txt", "first stored member".getBytes),
      ("b.bin", Array.tabulate[Byte](2000)(i => (i * 11).toByte)),
      ("empty.dat", Array.emptyByteArray))
    val es = Rar.rarEntries(Rar.rarWrite(members)).get
    assert(es.map(_.name) == members.map(_._1))
    assert(es.forall(_.method == 0))
    for ((e, (_, want)) <- es.zip(members)) {
      assert(e.size == want.length.toLong, e.name)
      assert(e.data.exists(_.sameElements(want)), e.name)
    }
  }

  test("a data CRC lie refuses the member (data = None), listing " +
      "survives") {
    val b = Rar.rarWrite(Seq(("f.txt", "payload".getBytes)))
    val at = b.indexOfSlice("payload".getBytes)
    val m = b.clone()
    m(at) = 'P'
    val es = Rar.rarEntries(m).get
    assert(es.length == 1 && es.head.data.isEmpty)
  }

  test("refusals: RAR4 signature, torn end, header CRC damage") {
    val good = Rar.rarWrite(Seq(("f.txt", "data".getBytes)))
    assert(Rar.rarEntries(good).isDefined)
    assert(Rar.rarEntries(null).isEmpty)
    // RAR4: Rar!\x1a\x07\x00
    assert(Rar.rarEntries(Array[Byte](0x52, 0x61, 0x72, 0x21, 0x1a,
      0x07, 0x00, 0, 0, 0, 0, 0, 0, 0, 0)).isEmpty)
    // cut before the end header: torn must refuse
    assert(Rar.rarEntries(good.take(good.length - 5)).isEmpty)
    // flip a bit inside the main header: CRC catches it
    val m = good.clone()
    m(14) = (m(14) ^ 0x10).toByte
    assert(Rar.rarEntries(m).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Rar.rarWrite(Seq(
      ("m0.txt", ("mut " * 200).getBytes),
      ("m1.txt", "x".getBytes)))
    val rnd = new scala.util.Random(0x4A4)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Rar.rarEntries(m) // must never throw
    }
    for (cut <- Seq(4, 8, 12, 20, 60, base.length - 1))
      Rar.rarEntries(base.take(cut))
  }
}
