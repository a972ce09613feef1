package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, PngMeta}

/** PNG ancillary metadata: all three text chunk forms, CRC
  * verification, density/time, refusals.
  */
class PngMetaSpec extends AnyFunSuite {

  private val pix = Array.tabulate(64)(i => (i * 4) % 256)
  private def png = Multimodal.pngEncodeGray(8, 8, pix)

  test("tEXt, zTXt, iTXt round-trip (compressed and plain iTXt)") {
    for (ppm <- Seq(100L, 101L)) { // even=plain iTXt, odd=deflated
      val b = PngMeta.pngWithMeta(png, "The Title",
        "longer description\nwith a second line", "utf8 Ω comment",
        ppm, (2026, 8, 15, 4, 30, 9))
      val m = PngMeta.pngTexts(b).get
      assert(m.texts == Seq(
        ("Title", "The Title"),
        ("Description", "longer description\nwith a second line"),
        ("Comment", "utf8 Ω comment")), s"ppm=$ppm")
      assert(m.ppmX.contains(ppm))
      assert(m.ppmY.contains(ppm + 1))
      assert(m.time == "2026-08-15 04:30:09")
    }
  }

  test("a metadata-free PNG parses to empty metadata") {
    val m = PngMeta.pngTexts(png).get
    assert(m.texts.isEmpty)
    assert(m.ppmX.isEmpty)
    assert(m.time == "")
  }

  test("pixels survive the metadata insertion") {
    val b = PngMeta.pngWithMeta(png, "t", "d", "c", 7L,
      (2026, 1, 1, 0, 0, 0))
    assert(Multimodal.pngDecodeLuma(b).map(_._3.toSeq) ==
      Multimodal.pngDecodeLuma(png).map(_._3.toSeq))
  }

  test("a lying chunk CRC refuses the file") {
    val b = PngMeta.pngWithMeta(png, "title", "d", "c", 7L,
      (2026, 1, 1, 0, 0, 0))
    // corrupt one byte inside the tEXt payload (starts after IHDR)
    val bad = b.clone()
    bad(33 + 8 + 7) = 'X' // inside "Title\0title"
    assert(PngMeta.pngTexts(bad).isEmpty)
  }

  test("refusals: signature, oversized keyword") {
    assert(PngMeta.pngTexts(null).isEmpty)
    assert(PngMeta.pngTexts("not a png".getBytes).isEmpty)
  }

  test("reader is total under mutation") {
    val base = PngMeta.pngWithMeta(png, "mut é", "desc é→Ω", "c Ω",
      42L, (2026, 8, 15, 1, 2, 3))
    val rnd = new scala.util.Random(2718)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      PngMeta.pngTexts(b) // must not throw
    }
  }
}
