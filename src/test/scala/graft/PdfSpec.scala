package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Pdf}

/** From-scratch PDF text extraction: every filter/xref/layout
  * variant must round-trip the planted text byte for byte; line and
  * kerning operators are pinned; encrypted and malformed inputs
  * classify as None.
  */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private val sample = "key agg row scan slow fast (table) " +
    "value\\part hash value table part a row"

  test("all 7 content variants x 3 xref kinds round-trip exactly") {
    for (v <- 0 until 7; k <- 0 until 3) {
      val pdf = Pdf.pdfWrite(sample, v, k)
      val got = Pdf.pdfText(pdf)
      assert(got.contains(Pdf.PdfText(sample, 1)), s"v=$v k=$k")
    }
  }

  test("empty text round-trips as empty through every variant") {
    for (v <- 0 until 7; k <- 0 until 3)
      assert(Pdf.pdfText(Pdf.pdfWrite("", v, k))
        .contains(Pdf.PdfText("", 1)), s"v=$v k=$k")
  }

  test("LZW and RunLength variants compress long repetitive ops " +
      "and still round-trip") {
    // long repeated content makes LZW build deep chains and RunLength
    // emit real runs (not just literal stretches)
    val rep = ("aaaa bbbb " * 40) + "zz" + ("q" * 200)
    for (v <- Seq(5, 6); k <- 0 until 3)
      assert(Pdf.pdfText(Pdf.pdfWrite(rep, v, k))
        .contains(Pdf.PdfText(rep, 1)), s"v=$v k=$k")
  }

  test("multi-page extraction joins pages with newline, counts pages") {
    val pages = Seq("first page words", "second page words",
      "third page words")
    for (k <- 0 until 3) {
      val pdf = Pdf.pdfWritePages(pages, 1, k)
      assert(Pdf.pdfText(pdf)
        .contains(Pdf.PdfText(pages.mkString("\n"), 3)), s"k=$k")
    }
  }

  test("text operators: quote, T*, Td/TD line breaks, Tm, kerning") {
    def ops(s: String) = Pdf.pdfText(Pdf.pdfWriteOps(s)).get.text
    // ' = next line + show; T* = bare next line
    assert(ops("BT (a) Tj (b) ' T* (c) Tj ET") == "a\nb\nc")
    // " takes word/char spacing operands ahead of the string
    assert(ops("BT (a) Tj 1 2 (b) \" ET") == "a\nb")
    // Td with vertical move breaks the line; pure horizontal does not
    assert(ops("BT (a) Tj 10 -14 Td (b) Tj 5 0 Td (c) Tj ET") ==
      "a\nb" + "c")
    assert(ops("BT (a) Tj 0 -14 TD (b) Tj ET") == "a\nb")
    // Tm resets the matrix -> line break
    assert(ops("BT (a) Tj 1 0 0 1 72 700 Tm (b) Tj ET") == "a\nb")
    // leading moves before any text emit nothing
    assert(ops("BT 72 720 Td T* (x) Tj ET") == "x")
    // TJ: adjustments <= -180 read as spaces, milder kerning ignored
    assert(ops("BT [(a) -278 (b) -50 (c) 120 (d)] TJ ET") == "a bcd")
    // escapes and octal in literal strings
    assert(ops("BT (par\\(en\\) back\\\\slash \\101) Tj ET") ==
      "par(en) back\\slash A")
    // hex strings, odd nibble padded
    assert(ops("BT <48492121> Tj <5> Tj ET") == "HI!!P")
    // inline image payload is skipped, text resumes after EI
    assert(ops("BT (a) Tj BI /W 1 /H 1 ID \u0000\u00ff\u0007 EI " +
      "(b) Tj ET") == "ab")
  }

  private def fontText(ops: String, fontRes: String,
      streams: Seq[(Int, Array[Byte])] = Nil): String =
    Pdf.pdfText(Pdf.pdfWriteFontOps(ops, fontRes, streams)).get.text

  private def cmap(body: String): Array[Byte] =
    ("/CIDInit /ProcSet findresource begin\nbegincmap\n" + body +
      "\nendcmap\nend end").getBytes("ISO-8859-1")

  test("Type0 font decodes 2-byte codes through /ToUnicode bfchar") {
    val cm = cmap("2 beginbfchar\n<0041> <0058>\n<0042> <0059>\n" +
      "endbfchar")
    val res = "<< /F1 << /Type /Font /Subtype /Type0 " +
      "/ToUnicode 5 0 R >> >>"
    assert(fontText("BT /F1 12 Tf <00410042> Tj ET", res,
      Seq(5 -> cm)) == "XY")
    // a code absent from the CMap is U+FFFD, never raw CID bytes
    assert(fontText("BT /F1 12 Tf <00410099> Tj ET", res,
      Seq(5 -> cm)) == "X�")
    // odd trailing byte of a 2-byte string is also U+FFFD
    assert(fontText("BT /F1 12 Tf <004141> Tj ET", res,
      Seq(5 -> cm)) == "X�")
  }

  test("ToUnicode bfrange: scalar increment and array forms") {
    val cm = cmap("1 beginbfrange\n<0001> <0003> <0061>\n" +
      "endbfrange\n1 beginbfrange\n<0005> <0006> [<0058> <0059>]\n" +
      "endbfrange")
    val res = "<< /F1 << /Type /Font /Subtype /Type0 " +
      "/ToUnicode 5 0 R >> >>"
    assert(fontText("BT /F1 9 Tf <000100020003> Tj ET", res,
      Seq(5 -> cm)) == "abc")
    assert(fontText("BT /F1 9 Tf <00050006> Tj ET", res,
      Seq(5 -> cm)) == "XY")
  }

  test("ToUnicode multi-unit destinations (ligature expansion)") {
    // fi ligature: one code maps to two UTF-16 units
    val cm = cmap("1 beginbfchar\n<0010> <00660069>\nendbfchar")
    val res = "<< /F1 << /Type /Font /Subtype /Type0 " +
      "/ToUnicode 5 0 R >> >>"
    assert(fontText("BT /F1 9 Tf <0010> Tj ET", res,
      Seq(5 -> cm)) == "fi")
  }

  test("simple font /Encoding /Differences remaps via glyph names") {
    val res = "<< /F1 << /Type /Font /Subtype /Type1 /Encoding " +
      "<< /Differences [65 /eacute /Euro 97 /uni0416] >> >> >>"
    // 65→é, 66→€ (names consume consecutive codes), 97→Ж
    assert(fontText("BT /F1 10 Tf (ABa) Tj ET", res) == "é€Ж")
    // codes outside /Differences keep their byte identity
    assert(fontText("BT /F1 10 Tf (Az) Tj ET", res) == "éz")
  }

  test("WinAnsi and MacRoman base encodings decode high bytes") {
    val win = "<< /F1 << /Type /Font /Subtype /TrueType " +
      "/Encoding /WinAnsiEncoding >> >>"
    // 0x92 = right single quote in cp1252
    assert(fontText("BT /F1 10 Tf (a\\222b) Tj ET", win) == "a’b")
    val mac = "<< /F1 << /Type /Font /Subtype /TrueType " +
      "/Encoding /MacRomanEncoding >> >>"
    // 0xA5 = bullet in MacRoman
    assert(fontText("BT /F1 10 Tf (a\\245b) Tj ET", mac) == "a•b")
  }

  test("single-byte /ToUnicode outranks the base encoding") {
    val cm = cmap("1 beginbfchar\n<41> <0051>\nendbfchar")
    val res = "<< /F1 << /Type /Font /Subtype /Type1 " +
      "/Encoding /WinAnsiEncoding /ToUnicode 5 0 R >> >>"
    assert(fontText("BT /F1 10 Tf (AB) Tj ET", res,
      Seq(5 -> cm)) == "QB")
  }

  test("Tf switches fonts mid-stream; unknown name resets to plain") {
    val res = "<< /F1 << /Type /Font /Subtype /Type1 /Encoding " +
      "<< /Differences [65 /eacute] >> >> " +
      "/F2 << /Type /Font /Subtype /Type1 >> >>"
    assert(fontText("BT /F1 8 Tf (A) Tj /F2 8 Tf (A) Tj " +
      "/F9 8 Tf (A) Tj ET", res) == "éAA")
  }

  test("font-encoded fixtures round-trip; raw decode would mojibake") {
    val s = "Grüße, Ωμέγα → done.\nsecond line 𝄞 clef"
    for (m <- 0 to 2) {
      val pdf = Pdf.pdfWriteFontEncoded(s, m)
      assert(Pdf.pdfText(pdf).get.text == s, s"mode=$m")
    }
    // empty text round-trips in every mode
    for (m <- 0 to 2)
      assert(Pdf.pdfText(Pdf.pdfWriteFontEncoded("", m)).get.text
        == "", s"mode=$m")
    // >200 distinct code points: single-byte modes fall back to
    // Type0 and still round-trip
    val wide = (0x100 to 0x3ff).map(_.toChar).mkString
    for (m <- 0 to 2)
      assert(Pdf.pdfText(Pdf.pdfWriteFontEncoded(wide, m)).get.text
        == wide, s"mode=$m wide")
  }

  test("fontless PDFs keep the historical raw-byte text path") {
    val ops = "BT (plain bytes stay) Tj ET"
    assert(Pdf.pdfText(Pdf.pdfWriteOps(ops)).get.text ==
      "plain bytes stay")
  }

  test("encrypted PDFs refuse extraction") {
    val enc = Pdf.pdfWriteEncrypted(sample)
    assert(Pdf.pdfText(enc).isEmpty)
    // the same bytes without /Encrypt parse fine
    assert(Pdf.pdfText(Pdf.pdfWrite(sample, 0, 0)).nonEmpty)
  }

  test("standard-handler encryption with empty user password " +
      "decrypts: RC4-40, RC4-128, AES-128, AES-256") {
    for (m <- 0 to 3; seed <- Seq(0L, 7L, 991L)) {
      val b = Pdf.pdfWriteEncryptedStd(sample, m, seed)
      assert(Pdf.pdfText(b).contains(Pdf.PdfText(sample, 1)),
        s"mode=$m seed=$seed")
    }
    // non-ASCII text through the AES path
    val wide = "résumé Ωμέγα done"
    assert(Pdf.pdfText(Pdf.pdfWriteEncryptedStd(wide, 2, 3L))
      .map(_.text).contains(wide))
  }

  test("AES-256 R5 (deprecated plain-SHA revision) also decrypts") {
    val sample5 = "r5 sealed words"
    assert(Pdf.pdfText(Pdf.pdfWriteEncryptedAes256(sample5, 3L,
      r6 = false)).map(_.text).contains(sample5))
    // damaged U hash refuses (wrong "password" per validation salt)
    val b = Pdf.pdfWriteEncryptedAes256(sample5, 3L)
    val s2 = new String(b.map(_.toChar))
    val uAt = s2.indexOf("/U <") + 4
    val dam = b.clone()
    dam(uAt) = (if (dam(uAt) == '0') '1' else '0').toByte
    assert(Pdf.pdfText(dam).isEmpty)
    // damaged Perms refuses (the 'adb' cross-check)
    val pAt = s2.indexOf("/Perms <") + 8
    val dam2 = b.clone()
    dam2(pAt) = (if (dam2(pAt) == '0') '1' else '0').toByte
    assert(Pdf.pdfText(dam2).isEmpty)
  }

  test("a real (non-empty) user password still refuses") {
    for (m <- 0 to 3)
      assert(Pdf.pdfText(
        Pdf.pdfWriteEncryptedStd(sample, m, 1L, userPw = "secret"))
        .isEmpty, s"mode=$m")
  }

  test("damaged encrypted files refuse, never emit garbage") {
    val b = Pdf.pdfWriteEncryptedStd(sample, 2, 5L)
    // truncation
    assert(Pdf.pdfText(b.take(b.length / 2)).isEmpty)
    // corrupt the AES ciphertext body: padding/inflate must refuse
    val s = new String(b.map(_.toChar))
    val streamAt = s.indexOf("stream\n") + 7
    val dam = b.clone()
    for (i <- streamAt + 20 until streamAt + 28)
      dam(i) = (dam(i) ^ 0x5a).toByte
    assert(Pdf.pdfText(dam).isEmpty)
    // flip the stored /U so the empty-password check fails
    val uAt = s.indexOf("/U <") + 4
    val dam2 = b.clone()
    dam2(uAt) = (if (dam2(uAt) == '0') '1' else '0').toByte
    assert(Pdf.pdfText(dam2).isEmpty)
  }

  test("malformed inputs classify as None") {
    assert(Pdf.pdfText(null).isEmpty)
    assert(Pdf.pdfText(Array.emptyByteArray).isEmpty)
    assert(Pdf.pdfText("not a pdf at all, truly".getBytes).isEmpty)
    val good = Pdf.pdfWrite(sample, 1, 1)
    assert(Pdf.pdfText(good.take(good.length / 2)).isEmpty)
    assert(Pdf.pdfText(good.take(20)).isEmpty)
    // damage the startxref offset digits
    val s = new String(good.map(_.toChar))
    val bad = s.replaceAll("startxref\n\\d+", "startxref\n999999999")
      .getBytes("ISO-8859-1")
    assert(Pdf.pdfText(bad).isEmpty)
  }

  test("decodeBatches integration extracts per-row text") {
    val df = Seq((1L, "alpha beta gamma", 1, 0),
      (2L, "delta epsilon", 3, 1), (3L, "zeta", 4, 2))
      .toDF("doc_id", "text", "v", "k")
    val pdfs = Pdf.synthPdfs(df, "text", "v", "k", "content")
    val out = Multimodal.decodeBatches(pdfs, "content",
      Pdf.pdfTextSchema)(Pdf.decodePdfText)
      .select("doc_id", "pdf_text", "n_pages")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "alpha beta gamma", 1),
      (2L, "delta epsilon", 1), (3L, "zeta", 1)))
  }

  test("warc-wrapped pdf bodies extract through the crawl path") {
    val df = Seq((10L, "crawl pdf body one", 0, 0),
      (11L, "crawl pdf body two", 2, 1))
      .toDF("doc_id", "text", "v", "gz")
    val pdfs = Pdf.synthPdfs(df, "text", "v",
      "gz", "pdf") // xref kind cycles with gz here, both valid
    val warcs = Pdf.synthPdfWarcs(pdfs, "doc_id", "pdf", "gz",
      "content")
    val out = Multimodal.decodeBatches(warcs, "content",
      Pdf.warcPdfTextSchema)(Pdf.decodeWarcPdfText)
      .select("doc_id", "pdf_text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((10L, "crawl pdf body one"),
      (11L, "crawl pdf body two")))
  }
}
