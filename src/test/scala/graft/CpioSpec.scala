package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cpio

/** cpio walk: bsdtar-written fixtures in both ASCII dialects list
  * and extract byte-exactly, the CRC dialect's checksum is verified
  * (a lying sum refuses), the writer round-trips all three formats
  * (and extracts under bsdtar — recorded at generation time), a
  * trailer-less stream refuses, damage is total.
  */
class CpioSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/cpio/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("bsdtar odc and newc fixtures list and extract byte-exactly") {
    for ((fx, fmt) <- Seq(("ref_odc.cpio", "odc"),
        ("ref_newc.cpio", "newc"))) {
      val es = Cpio.cpioEntries(resource(fx)).get
      assert(es.map(_.name) ==
        Seq("one.txt", "sub/two.txt", "bin.dat"), fx)
      assert(es.forall(_.format == fmt), fx)
      assert(es(0).data.sameElements(resource("one.txt")), fx)
      assert(es(1).data.sameElements(resource("two.txt")), fx)
      assert(es(2).data.sameElements(resource("bin.dat")), fx)
      assert(es(2).size == 768)
    }
  }

  test("writer round-trips every dialect (bsdtar-pinned at " +
      "generation time)") {
    val members = Seq(
      ("a.txt", "first".getBytes),
      ("dir/b.bin", Array.tabulate[Byte](513)(i => (i * 7).toByte)),
      ("empty", Array.emptyByteArray))
    for ((fmt, label) <- Seq((0, "odc"), (1, "newc"), (2, "crc"))) {
      val es = Cpio.cpioEntries(Cpio.cpioWrite(members, fmt)).get
      assert(es.map(_.name) == members.map(_._1), label)
      assert(es.forall(_.format == label), label)
      for ((e, (_, want)) <- es.zip(members))
        assert(e.data.sameElements(want), s"$label ${e.name}")
    }
  }

  test("the CRC dialect verifies the data sum — a lie refuses") {
    val b = Cpio.cpioWrite(Seq(("f.dat", "payload!".getBytes)), 2)
    assert(Cpio.cpioEntries(b).isDefined)
    // flip a data byte: the stored sum no longer matches
    val m = b.clone()
    val dataAt = m.indexOfSlice("payload!".getBytes)
    m(dataAt) = 'P'
    assert(Cpio.cpioEntries(m).isEmpty)
    // same flip in plain newc is accepted (no checksum to verify)
    val b1 = Cpio.cpioWrite(Seq(("f.dat", "payload!".getBytes)), 1)
    val m1 = b1.clone()
    m1(m1.indexOfSlice("payload!".getBytes)) = 'P'
    assert(Cpio.cpioEntries(m1).exists(
      _.head.data.sameElements("Payload!".getBytes)))
  }

  test("refusals: no trailer, bad magic, size lies, torn name") {
    val good = Cpio.cpioWrite(Seq(("f.txt", "data".getBytes)), 1)
    assert(Cpio.cpioEntries(good).isDefined)
    assert(Cpio.cpioEntries(null).isEmpty)
    assert(Cpio.cpioEntries(new Array[Byte](76)).isEmpty)
    // cut before the trailer: must refuse, not return a prefix
    assert(Cpio.cpioEntries(good.take(120)).isEmpty)
    val badMagic = good.clone()
    badMagic(5) = '9'
    assert(Cpio.cpioEntries(badMagic).isEmpty)
    // non-hex filesize
    val badSize = good.clone()
    badSize(54) = 'z'
    assert(Cpio.cpioEntries(badSize).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Cpio.cpioWrite(Seq(
      ("m0.txt", ("mut " * 100).getBytes),
      ("m1.txt", "x".getBytes)), 2)
    val rnd = new scala.util.Random(0xC9)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Cpio.cpioEntries(m) // must never throw
    }
    for (cut <- Seq(5, 76, 110, 200, base.length - 3))
      Cpio.cpioEntries(base.take(cut))
  }
}
