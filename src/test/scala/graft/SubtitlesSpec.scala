package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Subtitles

/** SRT + WebVTT extraction: timing arithmetic, tag stripping and
  * entity unescaping, NOTE/STYLE exclusion, multi-line cues, honest
  * refusals on structural damage.
  */
class SubtitlesSpec extends AnyFunSuite {

  test("srt round-trips cues with exact duration") {
    val doc = Subtitles.srtText(
      Subtitles.srtWrite(Seq("first cue", "second cue"), 13L)).get
    assert(doc.text == "first cue\nsecond cue")
    assert(doc.nCues == 2)
    // dur per cue = 1500 + (13%7)*10 = 1560
    assert(doc.durationMs == 2 * 1560L)
  }

  test("srt multi-line cue text keeps its internal break") {
    val srt = """1
00:00:01,000 --> 00:00:02,500
line one
line two

2
00:00:03,000 --> 00:00:04,000
solo
"""
    val doc = Subtitles.srtText(srt.getBytes("UTF-8")).get
    assert(doc.text == "line one\nline two\nsolo")
    assert(doc.nCues == 2)
    assert(doc.durationMs == 1500L + 1000L)
  }

  test("srt hours and big indexes parse; CRLF tolerated") {
    val srt = "42\r\n01:02:03,004 --> 01:02:04,004\r\ncue\r\n"
    val doc = Subtitles.srtText(srt.getBytes("UTF-8")).get
    assert(doc.text == "cue")
    assert(doc.durationMs == 1000L)
  }

  test("srt refusals: bad timing, non-numeric index, negative span") {
    assert(Subtitles.srtText(null).isEmpty)
    assert(Subtitles.srtText("".getBytes).isEmpty)
    assert(Subtitles.srtText("not an srt at all".getBytes).isEmpty)
    assert(Subtitles.srtText(
      "1\n00:00:02,000 --> 00:00:01,000\nbackwards\n".getBytes)
      .isEmpty)
    assert(Subtitles.srtText(
      "1\n00:00:70,000 --> 00:01:10,000\nbad seconds\n".getBytes)
      .isEmpty)
    assert(Subtitles.srtText(
      "1\n00:00:01,00 --> 00:00:02,000\nshort millis\n".getBytes)
      .isEmpty)
  }

  test("vtt round-trips through tags, settings, and entities") {
    val doc = Subtitles.vttText(
      Subtitles.vttWrite(Seq("a & b < c", "plain"), 3L)).get
    assert(doc.text == "a & b < c\nplain")
    assert(doc.nCues == 2)
    assert(doc.durationMs == 2 * (1500L + 3 * 10))
  }

  test("vtt NOTE and STYLE blocks never reach the text") {
    val doc = Subtitles.vttText(
      Subtitles.vttWrite(Seq("only cue"), 0L)).get
    assert(doc.text == "only cue")
    assert(!doc.text.contains("comment"))
    assert(!doc.text.contains("color"))
  }

  test("vtt hours-optional timing and no-identifier cues") {
    val vtt = """WEBVTT

00:05.000 --> 00:07.250
short form
"""
    val doc = Subtitles.vttText(vtt.getBytes("UTF-8")).get
    assert(doc.text == "short form")
    assert(doc.durationMs == 2250L)
  }

  test("vtt timestamp tags inside cue text strip cleanly") {
    val vtt = """WEBVTT

00:00:01.000 --> 00:00:04.000
karaoke <00:00:02.000>middle<00:00:03.000> end
"""
    val doc = Subtitles.vttText(vtt.getBytes("UTF-8")).get
    assert(doc.text == "karaoke middle end")
  }

  test("vtt refusals: missing signature, unterminated tag, bad timing") {
    assert(Subtitles.vttText(null).isEmpty)
    assert(Subtitles.vttText("WEBVTTX\n\n".getBytes).isEmpty)
    assert(Subtitles.vttText(
      "WEBVTT\n\n00:01.000 --> 00:02.000\nbroken <i tag\n".getBytes)
      .isEmpty)
    assert(Subtitles.vttText(
      "WEBVTT\n\njust an identifier\n".getBytes).isEmpty)
  }

  test("decoders are total under mutation") {
    val srt = Subtitles.srtWrite(Seq("mutate é→Ω", "two"), 5L)
    val vtt = Subtitles.vttWrite(Seq("mutate é→Ω", "two"), 5L)
    val rnd = new scala.util.Random(55)
    for (_ <- 0 until 300) {
      val a = srt.clone(); val b = vtt.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4)) {
        a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Subtitles.srtText(a); Subtitles.vttText(b) // must not throw
    }
  }
}
