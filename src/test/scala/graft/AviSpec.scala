package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Avi, Sniff}

/** AVI RIFF walk: planted header/stream metadata round-trips, the
  * stream clock wins over the avih product, movi payload is never
  * parsed, damage refuses, the walk is total.
  */
class AviSpec extends AnyFunSuite {

  test("planted metadata round-trips; duration comes from the " +
      "video stream clock") {
    val b = Avi.aviWrite(640, 480, fps = 25, nFrames = 250,
      codec = "MJPG", audioChannels = 2, audioRate = 44100)
    val m = Avi.aviMeta(b).get
    assert(m.width == 640 && m.height == 480)
    assert(m.durationMs == 250 * 40.0) // 250 frames at 25 fps
    assert(m.nStreams == 2)
    assert(m.videoCodec == "MJPG")
    assert(m.audioChannels == 2 && m.audioRate == 44100)
    assert(Sniff.sniff(b) == "video/x-msvideo")
  }

  test("refusals: wrong fourcc, truncation, lying chunk sizes") {
    val good = Avi.aviWrite(64, 48, 10, 10, "XVID", 1, 8000)
    assert(Avi.aviMeta(good).isDefined)
    assert(Avi.aviMeta(null).isEmpty)
    assert(Avi.aviMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    for (cut <- Seq(10, 30, 80, good.length / 2))
      assert(Avi.aviMeta(good.take(cut)).isEmpty
        || Avi.aviMeta(good.take(cut)).isDefined, s"total $cut")
    // a hdrl-less RIFF refuses
    val noHdrl = good.clone()
    val at = noHdrl.indexOfSlice("hdrl".getBytes)
    noHdrl(at) = 'x'
    assert(Avi.aviMeta(noHdrl).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Avi.aviWrite(320, 240, 30, 90, "H264", 2, 48000)
    val rnd = new scala.util.Random(0xAF1)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Avi.aviMeta(m) // must never throw
    }
    for (cut <- Seq(4, 12, 24, 100, base.length - 3))
      Avi.aviMeta(base.take(cut))
  }
}
