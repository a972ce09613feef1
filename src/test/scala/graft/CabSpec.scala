package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cab

/** CAB extraction: the committed fixture (bsdtar-extracted
  * byte-exactly at generation — the reverse pin, since libarchive
  * reads but cannot write cab), MSZIP cross-block window behavior,
  * checksum/damage refusals.
  */
class CabSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/cab/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("committed fixture extracts byte-exactly (stored + " +
      "multi-block MSZIP with the cross-block window)") {
    val b = resource("fix1.cab")
    val got = Cab.extractAll(b).get
      .map { case (e, d) => e.name -> (e, d) }.toMap
    for ((n, comp) <- Seq(("plain.txt", "none"), ("big.txt",
        "mszip"), ("small.txt", "mszip"))) {
      val want = resource(n)
      val (e, d) = got(n)
      assert(e.compression == comp, n)
      assert(e.size == want.length.toLong, n)
      assert(d.isDefined && java.util.Arrays.equals(d.get, want), n)
    }
    // big.txt spans 4 CFDATA blocks: a correct decode REQUIRES the
    // preset-dictionary carry (deflate back-references cross blocks)
    assert(got("big.txt")._1.size > 3 * 32768)
  }

  test("writer round-trips unicode names and empty-ish members") {
    val members = Seq(
      ("unié Ω.txt", "utf8 named".getBytes("UTF-8"), 1),
      ("a.bin", Array[Byte](0, 1, 2), 0))
    val got = Cab.extractAll(Cab.write(members)).get
      .map { case (e, d) => e.name -> d }.toMap
    for ((n, want, _) <- members)
      assert(got(n).exists(java.util.Arrays.equals(_, want)), n)
  }

  test("damage refuses: magic, checksum, CK signature, truncation") {
    val b = resource("fix1.cab")
    assert(Cab.entries(null).isEmpty)
    assert(Cab.entries("MSCF but short".getBytes).isEmpty)
    val m = b.clone(); m(0) = 'X'
    assert(Cab.entries(m).isEmpty)
    assert(Cab.entries(b.take(b.length / 2)).isEmpty)
    // flip one payload byte: that folder's members null, the
    // checksum catches it (never silently-wrong bytes)
    val c = b.clone()
    c(b.length - 100) = (c(b.length - 100) ^ 0x20).toByte
    val got = Cab.extractAll(c)
    assert(got.isDefined)
    assert(got.get.exists(_._2.isEmpty), "damaged folder must null")
  }

  test("decoder is total under random mutation") {
    val rnd = new scala.util.Random(0xCAB5L)
    val valid = Cab.write(Seq(
      ("m.txt", ("cab mutation corpus " * 30).getBytes, 1),
      ("s.txt", "stored".getBytes, 0)))
    for (_ <- 0 until 200) {
      val m = valid.clone()
      val k = 1 + rnd.nextInt(3)
      for (_ <- 0 until k) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { Cab.entries(m); Cab.extractAll(m) }
      catch {
        case e: Throwable =>
          fail(s"threw ${e.getClass.getSimpleName}")
      }
    }
  }
}
