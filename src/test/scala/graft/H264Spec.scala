package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{H264, Multimodal}

/** H.264 SPS header parse: the encoder's mb-count + crop arithmetic
  * must reverse exactly for every profile layout; emulation bytes
  * round-trip; malformed bits refuse.
  */
class H264Spec extends AnyFunSuite {

  test("spsEncode/spsParse round-trips dims, profile, level") {
    for {
      profile <- Seq(66, 77, 100) // Baseline / Main / High (chroma branch)
      level <- Seq(10, 30, 51)
      (w, h) <- Seq((640, 480), (1920, 1080), (160, 90), (302, 154),
        (16, 16), (3840, 2160))
    } {
      val got = H264.spsParse(H264.spsEncode(profile, level, w, h))
      assert(got.contains(H264.SpsInfo(profile, level, w, h)),
        s"profile=$profile level=$level ${w}x$h")
    }
  }

  test("rbsp emulation-prevention escape round-trips") {
    val cases = Seq(
      Array[Byte](0, 0, 0, 0, 0),
      Array[Byte](0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0),
      Array[Byte](1, 2, 3, 4),
      Array.fill[Byte](64)(0),
      Array[Byte](0, 0),
      Array.emptyByteArray)
    for (c <- cases) {
      val escaped = H264.escapeRbsp(c)
      // no unescaped 00 00 0x survives in the escaped form
      val s = escaped.map(_ & 0xff)
      for (i <- 0 until s.length - 2)
        assert(!(s(i) == 0 && s(i + 1) == 0 && s(i + 2) <= 2),
          s"raw zero run at $i in ${escaped.mkString(",")}")
      assert(H264.unescapeRbsp(Array[Byte](0x67) ++ escaped, 1)
        .sameElements(c), c.mkString(","))
    }
  }

  test("avcC record round-trips its first SPS") {
    val rec = H264.avcCEncode(100, 41, 1280, 720)
    assert(H264.avcCSps(rec).contains(H264.SpsInfo(100, 41, 1280, 720)))
    // damaged: version, truncation, zero SPS count
    val v = rec.clone(); v(0) = 2
    assert(H264.avcCSps(v).isEmpty)
    assert(H264.avcCSps(rec.take(6)).isEmpty)
    val z = rec.clone(); z(5) = 0xe0.toByte
    assert(H264.avcCSps(z).isEmpty)
    assert(H264.avcCSps(null).isEmpty)
  }

  test("spsParse refuses malformed bits, never throws") {
    assert(H264.spsParse(null).isEmpty)
    assert(H264.spsParse(Array[Byte](0x67, 1)).isEmpty)
    // wrong NAL type (PPS = 8)
    val sps = H264.spsEncode(66, 30, 640, 480)
    val pps = sps.clone(); pps(0) = 0x68.toByte
    assert(H264.spsParse(pps).isEmpty)
    // forbidden bit set
    val fb = sps.clone(); fb(0) = (fb(0) | 0x80).toByte
    assert(H264.spsParse(fb).isEmpty)
    // every truncation refuses or parses — never throws
    for (n <- 1 until sps.length)
      H264.spsParse(sps.take(n))
    // every single-byte mutation refuses or parses — never throws
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val m = sps.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264.spsParse(m)
    }
  }

  test("mp4Meta surfaces codec + SPS triage from the avc1 stsd") {
    val b = Multimodal.mp4EncodeMeta("isom", timescale = 1000,
      duration = 4000, tracks = Seq((0, 0), (1280, 720)),
      avc = Some((77, 31)))
    val m = Multimodal.mp4Meta(b).get
    assert(m.codec == "avc1" && m.nTracks == 2)
    assert(m.sps.contains(H264.SpsInfo(77, 31, 1280, 720)))
    // no stsd planted: codec/sps stay null/None (the pre-SPS layout)
    val plainMp4 = Multimodal.mp4EncodeMeta("mp42", 1000, 7500,
      Seq((640, 360)))
    val pm = Multimodal.mp4Meta(plainMp4).get
    assert(pm.codec == null && pm.sps.isEmpty)
    // a damaged avcC degrades to codec-only, container meta intact
    val dam = b.clone()
    val at = { // find the avcC payload and break its version byte
      val s = new String(dam.map(c => (c & 0xff).toChar))
      s.indexOf("avcC") + 4
    }
    dam(at) = 9
    val dm = Multimodal.mp4Meta(dam).get
    assert(dm.codec == "avc1" && dm.sps.isEmpty &&
      dm.width == 1280 && dm.durationMs == 4000)
  }
}
