package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cfb, Msg}

/** Outlook .msg extraction: both string-property forms, per-field
  * narrow/wide fallback, decoy exclusion, honest refusals.
  */
class MsgSpec extends AnyFunSuite {

  test("UTF-16LE properties round-trip (mode 0)") {
    val doc = Msg.msgText(
      Msg.msgWrite("Quarterly Ω report", "body\nline two",
        "Sender Name", 0)).get
    assert(doc.subject == "Quarterly Ω report")
    assert(doc.body == "body\nline two")
    assert(doc.sender == "Sender Name")
  }

  test("8-bit 001E properties round-trip (mode 1)") {
    val doc = Msg.msgText(
      Msg.msgWrite("plain subject", "café body é", "name", 1)).get
    assert(doc.subject == "plain subject")
    assert(doc.body == "café body é")
    assert(doc.sender == "name")
  }

  test("narrow preference falls back per-field for wide text") {
    val doc = Msg.msgText(
      Msg.msgWrite("wide Ω subject", "narrow body", "日本", 1)).get
    assert(doc.subject == "wide Ω subject")
    assert(doc.body == "narrow body")
    assert(doc.sender == "日本")
  }

  test("decoy properties never leak (mode 2)") {
    val doc = Msg.msgText(
      Msg.msgWrite("s", "b", "f", 2)).get
    assert(doc.subject == "s")
    assert(doc.body == "b")
    assert(!doc.body.contains("IPM.Note"))
    assert(!doc.body.contains("corpus@example.test"))
  }

  test("the MELA-wrapped RTF body recovers the text in every mode") {
    for (m <- 0 to 2) {
      val doc = Msg.msgText(
        Msg.msgWrite("s", "rtf body é→Ω\nline", "f", m)).get
      assert(doc.rtfBodyText == "rtf body é→Ω\nline", s"mode $m")
    }
  }

  test("an LZFu-compressed RTF body refuses to empty, never garbage") {
    val good = Msg.msgWrite("s", "b", "f", 0)
    val doc0 = Cfb.cfbStreams(good).get
    val rtf = doc0.streams
      .find(_.name == "__substg1.0_10090102").get.data.clone()
    // flip COMPTYPE to LZFu
    rtf(8) = 'L'; rtf(9) = 'Z'; rtf(10) = 'F'; rtf(11) = 'u'
    val rebuilt = Cfb.cfbWrite(
      doc0.streams.map(s =>
        if (s.name == "__substg1.0_10090102") (s.name, rtf)
        else (s.name, s.data)))
    val doc = Msg.msgText(rebuilt).get
    assert(doc.body == "b") // plain body still extracted
    assert(doc.rtfBodyText == "")
  }

  test("LZFu values with trailing slack decode; a lying COMPSIZE " +
      "refuses (round 16)") {
    val rtf = "{\\rtf1\\ansi body text par}".getBytes("ISO-8859-1")
    val v = graft.operators.Lzfu.compress(rtf)
    assert(Msg.rtfDecompressed(v).exists(_.sameElements(rtf)))
    // trailing slack beyond 4+COMPSIZE is legal in real properties
    val slack = v ++ Array[Byte](9, 9, 9, 9, 9)
    assert(Msg.rtfDecompressed(slack).exists(_.sameElements(rtf)))
    // COMPSIZE pointing past the buffer refuses
    val lying = v.clone()
    lying(0) = (v.length & 0xff).toByte // COMPSIZE := len (> len-4)
    lying(1) = ((v.length >> 8) & 0xff).toByte
    assert(Msg.rtfDecompressed(lying).isEmpty)
    // COMPSIZE smaller than the remaining header refuses
    val tiny = v.clone()
    tiny(0) = 4; tiny(1) = 0; tiny(2) = 0; tiny(3) = 0
    assert(Msg.rtfDecompressed(tiny).isEmpty)
  }

  test("absent properties come back empty") {
    val bytes = Cfb.cfbWrite(Seq(
      ("__substg1.0_0037001F",
        "only subject".getBytes("UTF-16LE")),
      ("__properties_version1.0", new Array[Byte](32))))
    val doc = Msg.msgText(bytes).get
    assert(doc.subject == "only subject")
    assert(doc.body == "")
    assert(doc.sender == "")
  }

  test("refusals: non-CFB, non-msg CFB, odd-length UTF-16 stream") {
    assert(Msg.msgText(null).isEmpty)
    assert(Msg.msgText("nope".getBytes).isEmpty)
    assert(Msg.msgText(Cfb.cfbWrite(Seq(
      ("WordDocument", "x".getBytes)))).isEmpty)
    val odd = Cfb.cfbWrite(Seq(
      ("__substg1.0_0037001F", Array[Byte](65, 0, 66))))
    assert(Msg.msgText(odd).isEmpty)
  }

  test("cfb label resolves to ms-outlook") {
    val bytes = Msg.msgWrite("s", "b", "f", 0)
    assert(Cfb.cfbStreams(bytes).get.label ==
      "application/vnd.ms-outlook")
    assert(graft.operators.Sniff.sniff(bytes) ==
      "application/vnd.ms-outlook")
  }

  test("decoder is total under mutation") {
    val base = Msg.msgWrite("mut é→Ω", "body é→Ω", "f", 2)
    val rnd = new scala.util.Random(321)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Msg.msgText(b) // must not throw
    }
  }

  test("attachments walk the CFB directory tree: names, bytes, " +
      "order (round 15)") {
    val atts = Seq(
      ("first.txt", "first attachment".getBytes("UTF-8")),
      ("deck Ω.bin", Array.tabulate[Byte](5000)(i => (i % 251)
        .toByte)))
    val b = Msg.msgWrite("s", "body", "sender", 0, atts)
    // the message text surface is untouched by attachments
    assert(Msg.msgText(b).get.body == "body")
    val got = Msg.msgAttachments(b).get
    assert(got.map(_._1) == Seq("first.txt", "deck Ω.bin"))
    for (((_, d), (_, want)) <- got.zip(atts))
      assert(java.util.Arrays.equals(d, want))
    // attachment-less messages report an empty walk, not a refusal
    assert(Msg.msgAttachments(Msg.msgWrite("s", "b", "x", 1))
      .exists(_.isEmpty))
    assert(Msg.msgAttachments("junk".getBytes).isEmpty)
  }
}
