package graft

import graft.operators.{Multimodal, WebP}

/** VP8L round-trips through all three encoder layouts (subtract-green,
  * predictor, palette+bundling), malformed classification, and the
  * unified image-hash path.
  */
class WebPSpec extends SparkSpec {

  private def grad(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + 13) % 256)

  test("subtract-green layout round-trips pixels exactly") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 16), (40, 30), (64, 64))) {
      val pix = grad(w, h)
      val bytes = WebP.encodeGraySubtractGreen(w, h, pix)
      val Some((dw, dh, luma)) = WebP.decodeLuma(bytes)
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      assert(luma.sameElements(pix), s"pixels for ${w}x$h")
    }
  }

  test("predictor layout round-trips for every predictor mode") {
    val (w, h) = (17, 9) // odd width exercises the TR wraparound
    val pix = grad(w, h)
    for (mode <- 1 to 13) {
      val bytes = WebP.encodeGrayPredictor(w, h, pix, mode)
      val got = WebP.decodeLuma(bytes)
      assert(got.exists(_._3.sameElements(pix)), s"mode $mode")
    }
  }

  test("palette layout round-trips at every bundling width") {
    // 2, 4, 16 and 17 levels -> 1-, 2-, 4-bit bundling and none
    for (nLevels <- Seq(2, 4, 16, 17, 160)) {
      val (w, h) = (21, 6) // width not a multiple of any bundle size
      val pix = Array.tabulate(w * h)(i => (i * 31 + 5) % nLevels * 1)
      val levels = pix.map(v => 30 + v * (220 / nLevels))
      val bytes = WebP.encodeGrayPalette(w, h, levels)
      val got = WebP.decodeLuma(bytes)
      assert(got.exists(_._3.sameElements(levels)),
        s"palette size $nLevels")
    }
  }

  test("malformed / unsupported inputs classify as None") {
    assert(WebP.decodeLuma(null).isEmpty)
    assert(WebP.decodeLuma("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(WebP.decodeLuma("not a webp at all".getBytes).isEmpty)
    val good = WebP.encodeGraySubtractGreen(8, 8, grad(8, 8))
    assert(WebP.decodeLuma(good.take(24)).isEmpty)     // truncated
    assert(WebP.decodeLuma(good.dropRight(6)).isEmpty) // cut bitstream
    // a lossy VP8 chunk tag must not be claimed
    val lossy = good.clone()
    lossy(12) = 'V'; lossy(13) = 'P'; lossy(14) = '8'; lossy(15) = ' '
    assert(WebP.decodeLuma(lossy).isEmpty)
    // PNG/GIF magic untouched by the webp sniffer
    assert(WebP.decodeLuma(
      Multimodal.gifEncodeGray(8, 8, grad(8, 8))).isEmpty)
  }

  test("bmp round-trips both row orders and non-multiple-of-4 " +
      "widths; malformed classify as None") {
    for ((w, h) <- Seq((5, 3), (16, 16), (21, 9));
         td <- Seq(false, true)) {
      val pix = grad(w, h)
      val bmp = Multimodal.bmpEncodeGray(w, h, pix, topDown = td)
      val got = Multimodal.bmpDecodeLuma(bmp)
      assert(got.exists(_._3.sameElements(pix)),
        s"${w}x$h topDown=$td")
      assert(got.get._1 == w && got.get._2 == h)
    }
    assert(Multimodal.bmpDecodeLuma("BMjunk".getBytes).isEmpty)
    assert(Multimodal.bmpDecodeLuma(null).isEmpty)
    val good = Multimodal.bmpEncodeGray(8, 8, grad(8, 8))
    assert(Multimodal.bmpDecodeLuma(good.take(60)).isEmpty)
    // and the unified hash path covers it, equal to the PNG hash
    val pix = grad(16, 16)
    assert(Multimodal.imageAHash(
      Multimodal.bmpEncodeGray(16, 16, pix)) ==
      Multimodal.imageAHash(Multimodal.pngEncodeGray(16, 16, pix)))
    assert(Multimodal.imageDims(good).contains(
      Multimodal.ImageDims("bmp", 8, 8, 1)))
  }

  test("header dims cover gif and webp alongside png/jpeg") {
    val webp = WebP.encodeGraySubtractGreen(33, 21, grad(33, 21))
    assert(Multimodal.imageDims(webp).contains(
      Multimodal.ImageDims("webp", 33, 21, 3)))
    val gif = Multimodal.gifEncodeGray(19, 7, grad(19, 7))
    assert(Multimodal.imageDims(gif).contains(
      Multimodal.ImageDims("gif", 19, 7, 3)))
    assert(Multimodal.webpDims("RIFF1234WAVE".getBytes).isEmpty)
    assert(Multimodal.gifDims("GIF8".getBytes).isEmpty)
    // tiff: both byte orders, SHORT and LONG typed fields
    for (be <- Seq(false, true)) {
      val t = Multimodal.tiffEncodeDims(1234, 88, 3, be)
      assert(Multimodal.imageDims(t).contains(
        Multimodal.ImageDims("tiff", 1234, 88, 3)), s"be=$be")
    }
    assert(Multimodal.tiffDims("II*x".getBytes).isEmpty)
    assert(Multimodal.tiffDims(null).isEmpty)
    // unsigned-32 dims whose product wraps Long negative and slides
    // under the pixel cap: must classify None, not emit bogus dims
    val evil = Multimodal.tiffEncodeDims(-1, 0, 1, bigEndian = false)
    evil(24) = 4 // retype the height entry SHORT -> LONG
    evil(30) = -1; evil(31) = -1; evil(32) = -1; evil(33) = -1
    assert(Multimodal.tiffDims(evil).isEmpty)
  }

  test("vp8 boolean coder round-trips randomized bit/prob sequences") {
    val rnd = new scala.util.Random(0xB001L)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(300)
      val bits = Array.fill(n)(rnd.nextInt(2))
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val got = WebP.boolCoderCheck(bits, probs)
      assert(got.sameElements(bits), s"trial=$trial n=$n")
    }
    // all-zero and all-one runs at extreme probabilities
    for (p <- Seq(1, 128, 254); b <- Seq(0, 1)) {
      val bits = Array.fill(64)(b)
      val probs = Array.fill(64)(p)
      assert(WebP.boolCoderCheck(bits, probs).sameElements(bits),
        s"p=$p b=$b")
    }
  }

  test("vp8 lossy header fields round-trip; pixels route to the " +
      "full Vp8 decoder") {
    for ((w, h, q, f, s, np) <- Seq((16, 16, 0, 0, 0, 0),
      (1600, 1024, 127, 63, 7, 3), (320, 240, 64, 31, 4, 1))) {
      val b = WebP.vp8Write(w, h, q, f, s, np, 0)
      val m = WebP.vp8Meta(b).get
      assert(m.width == w && m.height == h && m.yAcQi == q &&
        m.filterLevel == f && m.sharpness == s &&
        m.nPartitions == (1 << np) && !m.segmentation &&
        m.showFrame && m.version == 0,
        s"$m vs ($w,$h,$q,$f,$s,$np)")
      // the ARGB path stays VP8L-only (no color conversion for
      // lossy); LUMA now decodes via the full RFC 6386 pipeline
      // (real-stream bit-exactness is pinned in Vp8Spec)
      assert(WebP.decodeArgb(b).isEmpty)
      assert(WebP.decodeLuma(b).exists { case (dw, dh, l) =>
        dw == w && dh == h && l.length == w * h })
    }
  }

  test("vp8 meta refuses interframes, bad start codes, truncation") {
    val good = WebP.vp8Write(64, 48, 10, 20, 3, 1, 0)
    assert(WebP.vp8Meta(good).isDefined)
    // flip the keyframe bit (frame tag byte 0 bit 0) inside VP8 chunk
    val inter = good.clone()
    inter(20) = (inter(20) | 1).toByte
    assert(WebP.vp8Meta(inter).isEmpty)
    // damage the 9d 01 2a start code
    val badSc = good.clone()
    badSc(23) = 0x42
    assert(WebP.vp8Meta(badSc).isEmpty)
    assert(WebP.vp8Meta(good.take(good.length / 3)).isEmpty)
    assert(WebP.vp8Meta(null).isEmpty)
    // a VP8L container has no VP8 chunk
    val lossless = WebP.encodeGraySubtractGreen(8, 8,
      Array.fill(64)(128))
    assert(WebP.vp8Meta(lossless).isEmpty)
  }

  test("unified hash path covers webp; all three layouts of the same " +
      "pixels hash identically") {
    val pix = Array.tabulate(16 * 16) { i =>
      if (((i % 16) / 2 + (i / 16) / 2) % 2 == 0) 60 else 200
    }
    val a = Multimodal.imageAHash(
      WebP.encodeGraySubtractGreen(16, 16, pix))
    val b = Multimodal.imageAHash(
      WebP.encodeGrayPredictor(16, 16, pix, mode = 2))
    val c = Multimodal.imageAHash(WebP.encodeGrayPalette(16, 16, pix))
    val png = Multimodal.imageAHash(
      Multimodal.pngEncodeGray(16, 16, pix))
    assert(a.isDefined && a == b && b == c && c == png,
      s"a=$a b=$b c=$c png=$png")
  }
}
