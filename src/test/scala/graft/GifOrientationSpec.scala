package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** GIF codec round-trips, EXIF orientation application (the display
  * normalization that makes rotated copies hash identically), and the
  * audio signature pairing stage.
  */
class GifOrientationSpec extends SparkSpec {
  import spark.implicits._

  private def grad(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + 13) % 256)

  // ---- GIF ----

  test("gifEncodeGray -> gifDecodeLuma round-trips pixels exactly") {
    for ((w, h) <- Seq((3, 2), (16, 16), (40, 30), (64, 64))) {
      val pix = grad(w, h)
      val bytes = Multimodal.gifEncodeGray(w, h, pix)
      val Some((dw, dh, luma)) = Multimodal.gifDecodeLuma(bytes)
      assert((dw, dh) == (w, h), s"dims for ${w}x$h")
      assert(luma.sameElements(pix), s"pixels for ${w}x$h")
    }
  }

  test("interlaced GIF decodes to the same pixels as sequential") {
    val (w, h) = (24, 17) // odd height exercises every interlace pass
    val pix = grad(w, h)
    val seq = Multimodal.gifDecodeLuma(
      Multimodal.gifEncodeGray(w, h, pix)).get._3
    val il = Multimodal.gifDecodeLuma(
      Multimodal.gifEncodeGray(w, h, pix, interlaced = true)).get._3
    assert(il.sameElements(seq))
    assert(seq.sameElements(pix))
  }

  test("gif periodic-clear path: images past 254 literals round-trip") {
    // 40x30 = 1200 pixels crosses several CLEAR resets
    val pix = Array.tabulate(1200)(i => (i * 31) % 251)
    val bytes = Multimodal.gifEncodeGray(40, 30, pix)
    assert(Multimodal.gifDecodeLuma(bytes).get._3.sameElements(pix))
  }

  test("gifDecodeLuma: malformed inputs classify as undecodable") {
    assert(Multimodal.gifDecodeLuma(null).isEmpty)
    assert(Multimodal.gifDecodeLuma("notagif".getBytes).isEmpty)
    assert(Multimodal.gifDecodeLuma(
      "GIF89a".getBytes ++ Array.fill[Byte](7)(0)).isEmpty)
    val good = Multimodal.gifEncodeGray(8, 8, grad(8, 8))
    assert(Multimodal.gifDecodeLuma(good.take(40)).isEmpty) // truncated
    // trailer immediately after the screen descriptor: no image
    val noImage = good.take(13 + 768) :+ 0x3b.toByte
    assert(Multimodal.gifDecodeLuma(noImage).isEmpty)
    // PNG/JPEG magic must not be claimed
    assert(Multimodal.gifDecodeLuma(
      Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)).isEmpty)
  }

  test("imageDecodeLuma sniffs GIF alongside PNG and JPEG") {
    val pix = grad(16, 16)
    val gif = Multimodal.gifEncodeGray(16, 16, pix)
    assert(Multimodal.imageDecodeLuma(gif).get._3.sameElements(pix))
    // and the unified hash path covers it
    assert(Multimodal.imageAHash(gif).isDefined)
  }

  // ---- orientation ----

  private def inv(o: Int): Int = o match {
    case 6 => 8
    case 8 => 6
    case x => x
  }

  test("applyOrientation: exact grids for all 8 transforms") {
    // 3x2 asymmetric plane: rows (1 2 3) (4 5 6)
    val in = Array(1, 2, 3, 4, 5, 6)
    val expected = Map(
      1 -> (3, 2, Array(1, 2, 3, 4, 5, 6)),
      2 -> (3, 2, Array(3, 2, 1, 6, 5, 4)),       // mirror horizontal
      3 -> (3, 2, Array(6, 5, 4, 3, 2, 1)),       // rotate 180
      4 -> (3, 2, Array(4, 5, 6, 1, 2, 3)),       // flip vertical
      5 -> (2, 3, Array(1, 4, 2, 5, 3, 6)),       // transpose
      6 -> (2, 3, Array(4, 1, 5, 2, 6, 3)),       // rotate 90 CW
      7 -> (2, 3, Array(6, 3, 5, 2, 4, 1)),       // transverse
      8 -> (2, 3, Array(3, 6, 2, 5, 1, 4)))       // rotate 90 CCW
    for (o <- 1 to 8) {
      val (w, h, out) = Multimodal.applyOrientation(in, 3, 2, o)
      val (ew, eh, e) = expected(o)
      assert((w, h) == (ew, eh), s"dims for orientation $o")
      assert(out.sameElements(e), s"pixels for orientation $o: " +
        out.mkString(","))
    }
  }

  test("applyOrientation: inverse orientation round-trips") {
    val (w, h) = (5, 3)
    val in = grad(w, h)
    for (o <- 1 to 8) {
      val (tw, th, t) = Multimodal.applyOrientation(in, w, h, o)
      val (bw, bh, back) = Multimodal.applyOrientation(t, tw, th, inv(o))
      assert((bw, bh) == (w, h), s"round-trip dims for $o")
      assert(back.sameElements(in), s"round-trip pixels for $o")
    }
  }

  test("rotated-stored JPEG copies hash identically after EXIF " +
      "normalization") {
    // displayed image: 64x64, 8x8 uniform blocks from a planted pattern
    val patt = 0x1357_9bdf_2468_ace1L | 1L
    val displayed = Array.tabulate(64 * 64) { i =>
      val (x, y) = (i % 64, i / 64)
      if ((patt >>> (8 * (y / 8) + x / 8) & 1L) != 0L) 200 else 60
    }
    val upright = Multimodal.jpegEncodeGray(64, 64, displayed)
    val base = Multimodal.imageAHash(upright).get
    for (o <- 2 to 8) {
      // stored = inverse display transform; tag with orientation o
      val (sw, sh, stored) =
        Multimodal.applyOrientation(displayed, 64, 64, inv(o))
      val bytes = Multimodal.withExifApp1(
        Multimodal.jpegEncodeGray(sw, sh, stored), o, bigEndian = o % 2 == 0)
      assert(Multimodal.imageAHash(bytes).contains(base),
        s"orientation $o must normalize to the upright hash")
      // and WITHOUT the tag the stored image hashes differently
      // (sanity: the normalization is doing real work) — skip 4 when
      // the pattern happens to be flip-symmetric (it is not, here)
      val untagged = Multimodal.imageAHash(
        Multimodal.jpegEncodeGray(sw, sh, stored)).get
      assert(untagged != base, s"orientation $o stored plane should " +
        "differ before normalization")
    }
  }

  test("imageDupPairs finds rotated copies once hashes are " +
      "orientation-normalized") {
    val patt = 0xdead_beef_0bad_f00dL | 1L
    val displayed = Array.tabulate(64 * 64) { i =>
      val (x, y) = (i % 64, i / 64)
      if ((patt >>> (8 * (y / 8) + x / 8) & 1L) != 0L) 190 else 50
    }
    val upright = Multimodal.jpegEncodeGray(64, 64, displayed)
    val (sw, sh, stored) =
      Multimodal.applyOrientation(displayed, 64, 64, inv(6))
    val rotated = Multimodal.withExifApp1(
      Multimodal.jpegEncodeGray(sw, sh, stored), 6, bigEndian = false)
    val media = Seq((1L, upright), (2L, rotated),
      (3L, Multimodal.gifEncodeGray(16, 16, grad(16, 16))))
      .toDF("doc_id", "content")
    val hashes = Multimodal.decodeBatches(media, "content",
      Multimodal.aHashSchema)(Multimodal.decodeAHash)
    val pairs = Multimodal.imageDupPairs(hashes, "doc_id", "ahash",
      maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  // ---- audio signature pairing ----

  test("audioDupPairs equals brute-force hamming over signatures") {
    val sigs = Seq(
      (1L, 0x888888888888888L), (2L, 0x888888888888889L), // d=1
      (3L, 0x123456789abcdeL), (4L, 0x123456789abcdeL),   // d=0
      (5L, 0x777777777777777L))                           // far
    val df = sigs.toDF("doc_id", "audio_sig")
    val got = Multimodal.audioDupPairs(df, "doc_id", "audio_sig",
        maxHamming = 2)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }
}
