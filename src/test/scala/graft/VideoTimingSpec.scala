package graft

import graft.operators.Multimodal

/** stts/stss/mdhd timing walk: exact run sums, sync-sample semantics
  * (absent stss = every sample a keyframe), bare-track skipping, and
  * malformed-input classification.
  */
class VideoTimingSpec extends SparkSpec {

  test("mp4Timing reads back planted stts runs and stss exactly") {
    val bytes = Multimodal.mp4EncodeTimed("avc1", 1200,
      Seq((10L, 2L), (5L, 4L)), Some(Seq(1L, 4L, 7L, 10L, 13L)),
      leadingBareTrack = false)
    val t = Multimodal.mp4Timing(bytes).get
    assert(t.codec == "avc1")
    assert(t.nSamples == 15L)
    assert(t.timescale == 1200L)
    assert(t.durationTicks == 40L)
    assert(t.fpsMilli == 15L * 1200 * 1000 / 40)
    assert(t.nKeyframes == 5L)
    assert(t.firstKeyframe == 1L)
    assert(!t.syncAll)
  }

  test("absent stss means every sample is a sync sample") {
    val bytes = Multimodal.mp4EncodeTimed("vp09", 1000,
      Seq((7L, 3L)), None, leadingBareTrack = false)
    val t = Multimodal.mp4Timing(bytes).get
    assert(t.syncAll)
    assert(t.nKeyframes == 7L)
    assert(t.firstKeyframe == 1L)
  }

  test("a leading bare track (no sample table) is skipped") {
    val withBare = Multimodal.mp4EncodeTimed("hvc1", 900,
      Seq((4L, 5L)), Some(Seq(1L, 3L)), leadingBareTrack = true)
    val without = Multimodal.mp4EncodeTimed("hvc1", 900,
      Seq((4L, 5L)), Some(Seq(1L, 3L)), leadingBareTrack = false)
    assert(Multimodal.mp4Timing(withBare) ==
      Multimodal.mp4Timing(without))
  }

  test("first keyframe need not be sample 1") {
    val bytes = Multimodal.mp4EncodeTimed("jpeg", 1000,
      Seq((8L, 1L)), Some(Seq(3L, 6L)), leadingBareTrack = false)
    val t = Multimodal.mp4Timing(bytes).get
    assert(t.firstKeyframe == 3L && t.nKeyframes == 2L)
  }

  test("mp3 frame walk: counts, first-frame fields, ID3 skip, " +
      "truncation refused") {
    val b = Multimodal.mp3Encode(7, brIdx = 9, srIdx = 1, mono = true)
    val m = Multimodal.mp3Meta(b).get
    assert(m.nFrames == 7L && m.sampleRate == 48000 &&
      m.kbps == 128 && m.mono)
    assert(m.durationUs == 7L * 1152 * 1000000L / 48000)
    // truncated mid-frame: corrupt, not short
    assert(Multimodal.mp3Meta(b.dropRight(10)).isEmpty)
    assert(Multimodal.mp3Meta("ID3junk".getBytes).isEmpty)
    assert(Multimodal.mp3Meta(null).isEmpty)
    // MPEG-2 version bits -> unsupported, None not a wrong guess
    val v2 = b.clone()
    val off = b.length - (144 * 128000 / 48000) * 7 // first frame
    v2(off + 1) = 0xf3.toByte // version 10 = MPEG-2
    assert(Multimodal.mp3Meta(v2).isEmpty)
  }

  test("flac STREAMINFO: planted bit fields read back exactly") {
    val b = Multimodal.flacEncodeMeta(96000, 6, 24, (1L << 35) + 5L)
    val m = Multimodal.flacMeta(b).get
    assert(m.sampleRate == 96000 && m.channels == 6 &&
      m.bitsPerSample == 24)
    assert(m.totalSamples == (1L << 35) + 5L)
    assert(m.durationUs == ((1L << 35) + 5L) * 1000000L / 96000)
    assert(Multimodal.flacMeta("fLaX0000".getBytes).isEmpty)
    assert(Multimodal.flacMeta(b.take(20)).isEmpty)
    assert(Multimodal.flacMeta(null).isEmpty)
  }

  test("adversarial stts counts/deltas classify, never overflow") {
    // one run whose count*delta product blows any Long accumulator
    val huge = Multimodal.mp4EncodeTimed("avc1", 1000,
      Seq((0xffffffffL, 0xffffffffL)), None, leadingBareTrack = false)
    assert(Multimodal.mp4Timing(huge).isEmpty)
    // many max-count runs: nSamples alone passes the sane cap
    val manyRuns = Multimodal.mp4EncodeTimed("avc1", 1000,
      Seq.fill(300)((0xffffffffL, 1L)), None, leadingBareTrack = false)
    assert(Multimodal.mp4Timing(manyRuns).isEmpty)
  }

  test("id3v2 text frames read back through all four encodings") {
    for (sel <- 0 until 4) {
      val b = Multimodal.mp3EncodeTagged(3, brIdx = 9, srIdx = 1,
        mono = true, "My Title", "Some Artist", "An Album", sel)
      // the frame walk still works behind the richer tag
      assert(Multimodal.mp3Meta(b).exists(_.nFrames == 3L),
        s"sel=$sel")
      assert(Multimodal.id3TextTags(b).contains(
        ("My Title", "Some Artist", "An Album")), s"sel=$sel")
    }
    // plain tag with no text frames: empty strings, not None
    val plain = Multimodal.mp3Encode(2, brIdx = 9, srIdx = 1,
      mono = false)
    assert(Multimodal.id3TextTags(plain).contains(("", "", "")))
    // no tag at all / garbage: None
    assert(Multimodal.id3TextTags("no tag here".getBytes).isEmpty)
    assert(Multimodal.id3TextTags(null).isEmpty)
    // truncated tag body classifies
    val b0 = Multimodal.mp3EncodeTagged(1, 9, 1, mono = true,
      "t", "a", "l", 0)
    assert(Multimodal.id3TextTags(b0.take(20)).isEmpty)
  }

  test("mp3 walk tolerates a trailing ID3v1 'TAG' block") {
    val frames = Multimodal.mp3Encode(5, brIdx = 9, srIdx = 1,
      mono = false)
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val m = Multimodal.mp3Meta(frames ++ tag).get
    assert(m.nFrames == 5L && m.sampleRate == 48000)
    // a TAG block with no frames ahead of it is still not an mp3
    assert(Multimodal.mp3Meta(tag).isEmpty)
    // 127 trailing bytes starting with TAG: corrupt, not a trailer
    assert(Multimodal.mp3Meta(frames ++ tag.take(127)).isEmpty)
  }

  test("malformed inputs classify as None") {
    assert(Multimodal.mp4Timing(null).isEmpty)
    assert(Multimodal.mp4Timing("nope".getBytes).isEmpty)
    val good = Multimodal.mp4EncodeTimed("avc1", 1000,
      Seq((3L, 2L)), None, leadingBareTrack = false)
    assert(Multimodal.mp4Timing(good.take(60)).isEmpty)
    // meta-only container (no stts anywhere) -> None, not a guess
    val metaOnly = Multimodal.mp4EncodeMeta("mp42", 1000, 500L,
      Seq((64, 48)))
    assert(Multimodal.mp4Timing(metaOnly).isEmpty)
  }
}
