package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vp8

/** Lossy VP8 key-frame decode pinned bit-exactly against the
  * reference decoder (system libwebp 1.2.4): ten fixtures across
  * pattern families (gradients/blocks/noise/stripes), sizes
  * (16x16..80x64, odd dims), and qualities (20..95) — every Y, U,
  * and V plane byte must match the reference's WebPDecodeYUV
  * output.
  */
class Vp8Spec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  private val manifest: Seq[(String, Int, Int)] =
    Seq("manifest.txt", "manifest2.txt").flatMap { mf =>
      new String(resource(mf), "US-ASCII")
        .split("\n").filter(_.nonEmpty).toSeq.map { l =>
          val p = l.split(" ")
          (p(0), p(1).toInt, p(2).toInt)
        }
    }

  test("all goldens decode bit-exactly (Y, U, V planes)") {
    assert(manifest.length == 18)
    for ((name, w, h) <- manifest) {
      val webp = resource(name + ".webp")
      val want = resource(name + ".yuv")
      val got = Vp8.decodeYuv(webp)
      assert(got.isDefined, s"$name refused")
      val (gw, gh, y, u, v) = got.get
      assert(gw == w && gh == h, s"$name dims $gw x $gh")
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      assert(want.length == w * h + 2 * cw * ch, name)
      val planes = Seq(
        ("Y", y, 0, w * h),
        ("U", u, w * h, cw * ch),
        ("V", v, w * h + cw * ch, cw * ch))
      for ((pn, plane, off, len) <- planes) {
        assert(plane.length == len, s"$name $pn length")
        var firstDiff = -1
        var nDiff = 0
        var i = 0
        while (i < len) {
          if (plane(i) != want(off + i)) {
            if (firstDiff < 0) firstDiff = i
            nDiff += 1
          }
          i += 1
        }
        if (nDiff != 0)
          fail(s"$name plane $pn: $nDiff/$len bytes differ, " +
            s"first at $firstDiff (got ${plane(firstDiff) & 0xff}" +
            s", want ${want(off + firstDiff) & 0xff})")
      }
    }
  }

  test("refusals: junk, truncation, lossless container") {
    assert(Vp8.decodeYuv(null).isEmpty)
    assert(Vp8.decodeYuv("no webp here at all".getBytes).isEmpty)
    val g = resource("g00.webp")
    assert(Vp8.decodeYuv(g.take(16)).isEmpty)
    val m = g.clone()
    // break the VP8 start code
    var i = 12
    var found = false
    while (i < m.length - 3 && !found) {
      if ((m(i) & 0xff) == 0x9d && (m(i + 1) & 0xff) == 0x01 &&
        (m(i + 2) & 0xff) == 0x2a) {
        m(i) = 0x00; found = true
      }
      i += 1
    }
    assert(found && Vp8.decodeYuv(m).isEmpty)
  }

  test("decoder is total under random mutation") {
    val rnd = new scala.util.Random(0x8B8B8BL)
    val valid = resource("g01.webp")
    for (_ <- 0 until 120) {
      val m = valid.clone()
      val k = 1 + rnd.nextInt(4)
      for (_ <- 0 until k) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try Vp8.decodeYuv(m)
      catch {
        case e: Throwable =>
          fail(s"threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
