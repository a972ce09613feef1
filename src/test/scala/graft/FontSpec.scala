package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Font

/** Font triage: the committed SYSTEM DejaVu Serif (a real-world
  * 20-table TrueType) parses to fc-scan's recorded family/style/
  * format facts, survives re-wrapping through BOTH web containers
  * (zlib WOFF, brotli WOFF2) with identical facts, the minimal
  * writer round-trips planted values, damage refuses, the walk is
  * total.
  */
class FontSpec extends AnyFunSuite {

  private def dejavu: Array[Byte] = {
    val in = getClass.getResourceAsStream("/font/DejaVuSerif.ttf")
    assert(in != null)
    try in.readAllBytes() finally in.close()
  }

  test("the system DejaVu Serif parses to fc-scan's facts") {
    val m = Font.fontMeta(dejavu).get
    assert(m.container == "sfnt" && m.flavor == "truetype")
    assert(m.family == "DejaVu Serif") // fc-scan: family
    assert(m.style == "Book") // fc-scan: style
    assert(m.nTables == 20)
    assert(m.unitsPerEm == 2048)
    assert(m.nGlyphs > 3000) // a full DejaVu face
  }

  test("the real font survives both web containers with " +
      "identical facts") {
    val base = Font.fontMeta(dejavu).get
    val woff = Font.fontMeta(Font.woffWrap(dejavu)).get
    assert(woff.container == "woff")
    assert((woff.family, woff.style, woff.nGlyphs,
      woff.unitsPerEm) ==
      (base.family, base.style, base.nGlyphs, base.unitsPerEm))
    val woff2 = Font.fontMeta(Font.woff2Wrap(dejavu)).get
    assert(woff2.container == "woff2")
    assert((woff2.family, woff2.style, woff2.nGlyphs,
      woff2.unitsPerEm) ==
      (base.family, base.style, base.nGlyphs, base.unitsPerEm))
  }

  test("the minimal writer round-trips planted values through " +
      "all three containers") {
    val sfnt = Font.sfntWrite("Family 7", "Bold", 432, 2048)
    for ((bytes, container) <- Seq(
        (sfnt, "sfnt"),
        (Font.woffWrap(sfnt), "woff"),
        (Font.woff2Wrap(sfnt), "woff2"))) {
      val m = Font.fontMeta(bytes).get
      assert(m.container == container)
      assert(m.family == "Family 7" && m.style == "Bold",
        container)
      assert(m.nGlyphs == 432 && m.unitsPerEm == 2048, container)
      assert(m.nTables == 3, container)
    }
  }

  test("refusals: magic, bad head magic, torn woff2 brotli") {
    assert(Font.fontMeta(null).isEmpty)
    assert(Font.fontMeta("not a font at all".getBytes).isEmpty)
    val sfnt = Font.sfntWrite("F", "R", 10, 1000)
    val badHead = sfnt.clone()
    // head magic lives inside the head table; find and flip it
    val at = badHead.indexOfSlice(Array[Byte](0x5f, 0x0f, 0x3c,
      0xf5.toByte))
    badHead(at) = 0
    assert(Font.fontMeta(badHead).isEmpty)
    val w2 = Font.woff2Wrap(sfnt)
    assert(Font.fontMeta(w2.take(w2.length - 4)).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Font.woffWrap(Font.sfntWrite("Mut", "It", 99, 2000))
    val rnd = new scala.util.Random(0xF0A7)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Font.fontMeta(m) // must never throw
    }
    val dj = dejavu
    for (cut <- Seq(4, 12, 100, dj.length / 2))
      Font.fontMeta(dj.take(cut))
  }
}
