package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Exif, Multimodal}

/** EXIF read + strip: IFD walk, exact GPS centi-arc-seconds, the
  * strip's bit-identical entropy data, refusals.
  */
class ExifSpec extends AnyFunSuite {

  private val pix = Array.tabulate(64)(i => (i * 4) % 256)
  private def jpeg = Multimodal.jpegEncodeGray(8, 8, pix)

  test("orientation, timestamp, and GPS round-trip exactly") {
    val lat = 51L * 360000 + 30 * 6000 + 2750 // 51°30'27.50"
    val lon = 0L * 360000 + 7 * 6000 + 39
    val b = Exif.exifWrap(jpeg, 6, "2026:08:15 04:30:00", lat, lon)
    val m = Exif.exifMeta(b).get
    assert(m.orientation == 6)
    assert(m.dateTime == "2026:08:15 04:30:00")
    assert(m.latCentiSec.contains(lat))
    assert(m.lonCentiSec.contains(lon))
  }

  test("strip removes the metadata and keeps the pixels bit-equal") {
    val original = jpeg
    val wrapped = Exif.exifWrap(original, 3, "2026:01:01 00:00:00",
      360000L, 720000L)
    val stripped = Exif.exifStrip(wrapped).get
    assert(Exif.exifMeta(stripped).isEmpty)
    assert(java.util.Arrays.equals(stripped, original))
    // decoded pixels identical
    assert(Multimodal.jpegDecodeLuma(stripped).get._3.toSeq ==
      Multimodal.jpegDecodeLuma(original).get._3.toSeq)
  }

  test("strip is the identity on an EXIF-free JPEG") {
    val b = jpeg
    assert(Exif.exifStrip(b).get eq b)
  }

  test("an inexact rational refuses the coordinate, not the file") {
    // hand-corrupt: set the lat seconds denominator to 7
    val b = Exif.exifWrap(jpeg, 1, "2026:01:01 00:00:00",
      100L, 200L)
    // the writer's layout is deterministic: TIFF base = 12 (SOI +
    // APP1 marker/len + "Exif\0\0"), lat rationals at TIFF offset
    // 124, the seconds DENOMINATOR 4 bytes into the third rational
    val i = 12 + 124 + 2 * 8 + 4
    assert((b(i) & 0xff) == 100 && b(i + 1) == 0, "layout moved")
    b(i) = 7
    val m = Exif.exifMeta(b).get
    assert(m.latCentiSec.isEmpty) // refused, not rounded
    assert(m.lonCentiSec.isDefined) // the other survives
  }

  test("refusals: not a jpeg, torn segment") {
    assert(Exif.exifMeta(null).isEmpty)
    assert(Exif.exifMeta("plain".getBytes).isEmpty)
    assert(Exif.exifStrip("plain".getBytes).isEmpty)
    val w = Exif.exifWrap(jpeg, 1, "2026:01:01 00:00:00", 1L, 2L)
    val torn = java.util.Arrays.copyOf(w, 40)
    assert(Exif.exifMeta(torn).isEmpty)
  }

  test("reader is total under mutation") {
    val base = Exif.exifWrap(jpeg, 5, "2026:08:15 01:02:03",
      123456L, 654321L)
    val rnd = new scala.util.Random(3141)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Exif.exifMeta(b); Exif.exifStrip(b) // must not throw
    }
  }
}
