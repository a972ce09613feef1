package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Tiff}

/** TIFF strip decode: exact pixel round-trip through every
  * compression/layout variant, cross-format hash equality with the
  * other raster codecs, malformed classification.
  */
class TiffSpec extends SparkSpec {
  import spark.implicits._

  private def grad(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + 13) % 256)

  test("every compression x byte order x layout round-trips exactly") {
    val (w, h) = (29, 23) // not strip-aligned
    val pix = grad(w, h)
    for {
      comp <- Seq(1, 5, 32773)
      be <- Seq(false, true)
      photo <- Seq(0, 1)
      rps <- Seq(5, 64) // multi-strip and single-strip
      pred <- if (comp == 5) Seq(1, 2) else Seq(1)
    } {
      val t = Tiff.tiffEncodeGray(w, h, pix, comp, be, photo, rps,
        pred)
      val got = Tiff.decodeLuma(t)
      assert(got.isDefined,
        s"comp=$comp be=$be photo=$photo rps=$rps pred=$pred")
      val (gw, gh, luma) = got.get
      assert(gw == w && gh == h && luma.sameElements(pix),
        s"comp=$comp be=$be photo=$photo rps=$rps pred=$pred")
    }
  }

  test("lzw survives dictionary resets on long repetitive strips") {
    val (w, h) = (64, 200) // big enough to hit the 4093 reset
    val pix = Array.tabulate(w * h)(i => (i * 31 + i / 7) % 256)
    val t = Tiff.tiffEncodeGray(w, h, pix, 5, false, 1, 200, 2)
    assert(Tiff.decodeLuma(t).get._3.sameElements(pix))
  }

  test("tiff joins the unified hash contract: same pixels, same " +
      "ahash as png/gif/bmp") {
    val (w, h) = (16, 16)
    val pix = Array.tabulate(w * h) { i =>
      if (((i % 16) / 2 + (i / 16) / 2) % 2 == 0) 60 else 200
    }
    val png = Multimodal.imageAHash(
      Multimodal.pngEncodeGray(w, h, pix))
    for (comp <- Seq(1, 5, 32773); be <- Seq(false, true)) {
      val t = Tiff.tiffEncodeGray(w, h, pix, comp, be)
      assert(Multimodal.imageAHash(t) == png, s"comp=$comp be=$be")
    }
    // WhiteIsZero stores inverted bytes but decodes to the same luma
    val t0 = Tiff.tiffEncodeGray(w, h, pix, 1, true, photometric = 0)
    assert(Multimodal.imageAHash(t0) == png)
  }

  test("malformed and unsupported inputs classify as None") {
    assert(Tiff.decodeLuma(null).isEmpty)
    assert(Tiff.decodeLuma("II*?".getBytes).isEmpty)
    val good = Tiff.tiffEncodeGray(16, 16, grad(16, 16), 5, false)
    assert(Tiff.decodeLuma(good).isDefined)
    assert(Tiff.decodeLuma(good.take(good.length / 2)).isEmpty)
    // dims-only fixtures (no strips) classify for the PIXEL decoder
    // while tiffDims still reads them
    val dimsOnly = Multimodal.tiffEncodeDims(64, 32, 3, false)
    assert(Tiff.decodeLuma(dimsOnly).isEmpty)
    assert(Multimodal.tiffDims(dimsOnly).isDefined)
  }
}
