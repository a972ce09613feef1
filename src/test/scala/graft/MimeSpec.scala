package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mime

/** RFC 5322/MIME email decode: transfer encodings, encoded-word
  * subjects, multipart recursion with alternative-last-wins, mbox
  * splitting — planted text round-trips exactly.
  */
class MimeSpec extends AnyFunSuite {

  private val sample = "email body résumé Ωμέγα = equals\n" +
    "second line\ttabbed & done"

  test("eml round-trips through all three layouts") {
    for (m <- 0 to 2) {
      val got = Mime.emlText(
        Mime.emlWrite("Sub Ωé", sample, m)).get
      assert(got.subject == "Sub Ωé", s"m=$m subj=${got.subject}")
      assert(got.text == sample, s"m=$m")
      assert(got.nParts == 1, s"m=$m nParts=${got.nParts}")
    }
    for (m <- 0 to 2)
      assert(Mime.emlText(Mime.emlWrite("s", "", m)).get.text == "",
        s"m=$m empty")
  }

  test("quoted-printable decode: hex, soft breaks, literal equals") {
    assert(new String(Mime.qpDecode("a=C3=A9b"), "UTF-8") == "aéb")
    assert(new String(Mime.qpDecode("long=\r\nline"), "UTF-8")
      == "longline")
    assert(new String(Mime.qpDecode("soft=\nbreak"), "UTF-8")
      == "softbreak")
    // malformed = kept literally (crawl tolerance)
    assert(new String(Mime.qpDecode("a=zzb"), "UTF-8") == "a=zzb")
    assert(new String(Mime.qpDecode("tail="), "UTF-8") == "tail=")
  }

  test("rfc2047 subjects: B and Q forms, adjacent-word join") {
    assert(Mime.rfc2047("=?utf-8?B?T8634bO9?=") ==
      new String(java.util.Base64.getDecoder.decode("T8634bO9"),
        "UTF-8"))
    assert(Mime.rfc2047("=?utf-8?Q?caf=C3=A9_au_lait?=") ==
      "café au lait")
    // whitespace between two encoded words is dropped...
    assert(Mime.rfc2047("=?utf-8?Q?one?= =?utf-8?Q?two?=") ==
      "onetwo")
    // ...but kept between an encoded word and plain text
    assert(Mime.rfc2047("=?utf-8?Q?one?= plain") == "one plain")
    assert(Mime.rfc2047("no encoded words at all") ==
      "no encoded words at all")
    // shift_jis label resolves through the shared charset table
    val sjis = "=?shift_jis?B?" + java.util.Base64.getEncoder
      .encodeToString("日本".getBytes("Shift_JIS")) + "?="
    assert(Mime.rfc2047(sjis) == "日本")
  }

  test("multipart/alternative takes the LAST alternative only") {
    val eml = ("Subject: t\n" +
      "Content-Type: multipart/alternative; boundary=\"bb\"\n\n" +
      "--bb\n" +
      "Content-Type: text/plain\n\n" +
      "worse rendering\n" +
      "--bb\n" +
      "Content-Type: text/plain\n\n" +
      "better rendering\n" +
      "--bb--\n").getBytes("ISO-8859-1")
    val got = Mime.emlText(eml).get
    assert(got.text == "better rendering" && got.nParts == 1)
  }

  test("folded headers unfold; html/binary siblings are skipped") {
    val eml = ("Subject: first\n" +
      " folded continuation\n" +
      "Content-Type: multipart/mixed;\n" +
      " boundary=\"zz\"\n\n" +
      "--zz\n" +
      "Content-Type: text/plain; charset=utf-8\n\n" +
      "kept\n" +
      "--zz\n" +
      "Content-Type: text/html\n\n" +
      "<p>skipped</p>\n" +
      "--zz--\n").getBytes("ISO-8859-1")
    val got = Mime.emlText(eml).get
    assert(got.subject == "first folded continuation")
    assert(got.text == "kept" && got.nParts == 1)
  }

  test("non-mail bytes, bad base64, missing boundary refuse") {
    assert(Mime.emlText(null).isEmpty)
    assert(Mime.emlText("plainly not an email".getBytes).isEmpty)
    val badB64 = ("Subject: x\n" +
      "Content-Type: text/plain\n" +
      "Content-Transfer-Encoding: base64\n\n" +
      "!!!not base64!!!\n").getBytes("ISO-8859-1")
    assert(Mime.emlText(badB64).isEmpty)
    val noBoundary = ("Subject: x\n" +
      "Content-Type: multipart/mixed\n\nbody").getBytes("ISO-8859-1")
    assert(Mime.emlText(noBoundary).isEmpty)
  }

  test("mbox splits messages and unstuffs From lines") {
    val m1 = Mime.emlWrite("s1", "first message\nFrom the start", 0)
    val m2 = Mime.emlWrite("s2", "second message", 1)
    val mbox = Mime.mboxWrite(Seq(m1, m2))
    val got = Mime.mboxMessages(mbox).get
    assert(got.length == 2)
    assert(got(0).text == "first message\nFrom the start")
    assert(got(1).text == "second message")
    assert(got(0).subject == "s1" && got(1).subject == "s2")
    assert(Mime.mboxMessages("not an mbox".getBytes).isEmpty)
  }
}
