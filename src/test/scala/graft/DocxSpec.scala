package graft

import org.apache.spark.sql.functions._

import graft.operators.{Archive, Docx, Multimodal}

/** OOXML text extraction: DOCX paragraphs/runs/tabs/decoys and XLSX
  * shared strings must round-trip the planted text exactly; encrypted
  * and malformed containers classify as None.
  */
class DocxSpec extends SparkSpec {
  import spark.implicits._

  private val sample = "alpha beta gamma & <delta> \"quoted\" " +
    "résumé Ωμέγα 𝄞 done"

  test("docx round-trips through all three layouts") {
    for (m <- 0 to 2) {
      val got = Docx.docxText(Docx.docxWrite(sample, m))
      assert(got.contains(Docx.DocxText(sample, 1)), s"m=$m")
    }
  }

  test("paragraphs split on newline and rejoin; counts match") {
    val text = "first para\nsecond para\n\nfourth after empty"
    for (m <- 0 to 2) {
      val got = Docx.docxText(Docx.docxWrite(text, m)).get
      assert(got.text == text && got.nParas == 4, s"m=$m")
    }
    // empty doc: one empty paragraph
    for (m <- 0 to 2)
      assert(Docx.docxText(Docx.docxWrite("", m))
        .contains(Docx.DocxText("", 1)), s"m=$m")
  }

  test("tabs survive both raw-in-w:t and <w:tab/> element routes") {
    val text = "col1\tcol2\tcol3"
    for (m <- 0 to 2)
      assert(Docx.docxText(Docx.docxWrite(text, m)).get.text == text,
        s"m=$m")
  }

  test("comment and instrText decoys are never extracted") {
    val pdf = Docx.docxWrite("visible", 2)
    val xml = {
      val es = Archive.zipEntries(pdf).get
      new String(Archive.zipExtract(pdf,
        es.find(_.name == "word/document.xml").get).get, "UTF-8")
    }
    assert(xml.contains("comment decoy") && xml.contains("PAGE"))
    assert(Docx.docxText(pdf).get.text == "visible")
  }

  test("w:br and w:cr emit newlines inside a paragraph") {
    // hand-authored document.xml through a raw zip
    val doc = ("<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t><w:cr/>" +
      "<w:t>c</w:t></w:r></w:p></w:body></w:document>")
      .getBytes("UTF-8")
    val zip = Archive.zipWrite(Seq(("word/document.xml", doc, true)))
    assert(Docx.docxText(zip).contains(Docx.DocxText("a\nb\nc", 1)))
  }

  test("'>' inside a quoted attribute value does not end the tag") {
    // legal XML: the scanner must track quote state or the remainder
    // of the tag leaks into the extracted text
    val doc = ("<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r w:note=\"a>b\" w:alt='c>d'>" +
      "<w:t>kept</w:t></w:r></w:p></w:body></w:document>")
      .getBytes("UTF-8")
    val zip = Archive.zipWrite(Seq(("word/document.xml", doc, false)))
    assert(Docx.docxText(zip).contains(Docx.DocxText("kept", 1)))
  }

  test("entities and CDATA unescape; numeric refs decode") {
    val doc = ("<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r><w:t>&lt;tag&gt; &amp;amp; &#233;&#x3A9;" +
      "<![CDATA[ <raw&bytes> ]]></w:t></w:r></w:p>" +
      "</w:body></w:document>").getBytes("UTF-8")
    val zip = Archive.zipWrite(Seq(("word/document.xml", doc, false)))
    assert(Docx.docxText(zip)
      .contains(Docx.DocxText("<tag> &amp; éΩ <raw&bytes> ", 1)))
  }

  test("malformed containers and XML classify as None") {
    assert(Docx.docxText(null).isEmpty)
    assert(Docx.docxText(Array.emptyByteArray).isEmpty)
    assert(Docx.docxText("PK not actually a zip".getBytes).isEmpty)
    // valid zip, no word/document.xml (e.g. an xlsx)
    val other = Archive.zipWrite(Seq(("readme.txt",
      "hello".getBytes("UTF-8"), false)))
    assert(Docx.docxText(other).isEmpty)
    // unterminated tag inside document.xml
    val bad = Archive.zipWrite(Seq(("word/document.xml",
      "<w:document><w:p><w:t>x".getBytes("UTF-8"), false)))
    assert(Docx.docxText(bad).isEmpty)
    // truncated zip (CRC/length damage)
    val good = Docx.docxWrite(sample, 1)
    assert(Docx.docxText(good.take(good.length / 2)).isEmpty)
  }

  test("xlsx shared strings round-trip through all three layouts") {
    val items = Seq("plain words", "ampersand & <esc>", "", "tail")
    for (m <- 0 to 2) {
      val got = Docx.xlsxStrings(Docx.xlsxWrite(items, m))
      assert(got.contains(
        Docx.XlsxStrings(items.mkString("\n"), 4)), s"m=$m")
    }
  }

  test("xlsx phonetic rPh runs are excluded from items") {
    val b = Docx.xlsxWrite(Seq("base text"), 2)
    val got = Docx.xlsxStrings(b).get
    assert(got.text == "base text" && got.nStrings == 1)
  }

  test("xlsx worksheet cells round-trip through all three layouts") {
    val words = Seq("alpha", "béta & <esc>", "", "gamma")
    for (m <- 0 to 2; seed <- Seq(0L, 7L, 12345L)) {
      val got = Docx.xlsxCells(Docx.xlsxCellsWrite(words, seed, m))
      assert(got.contains(Docx.XlsxCells(
        words.mkString("\n") + "\ninline " + seed,
        words.length + 5, 816 * seed + 610)), s"m=$m seed=$seed")
    }
  }

  test("centiCell: exact decimal forms, truncation, refusals") {
    assert(Docx.centiCell("12.3") == 1230)
    assert(Docx.centiCell("12.30") == 1230)
    assert(Docx.centiCell("12") == 1200)
    assert(Docx.centiCell(" 0.07 ") == 7)
    assert(Docx.centiCell("-0.07") == -7)
    assert(Docx.centiCell("+4.5") == 450)
    // sub-centi digits truncate toward zero (fixed-point read)
    assert(Docx.centiCell("1.239") == 123)
    assert(Docx.centiCell("-1.239") == -123)
    for (bad <- Seq("", ".", "-", "1e3", "1E3", "1.2x", "2,5",
      "0x10", "NaN"))
      intercept[RuntimeException](Docx.centiCell(bad))
  }

  test("xlsx cells: formula bodies are not values; decoys skipped") {
    // hand-built sheet: <f> content must never reach the sum, empty
    // and self-closed cells carry no value, b-cells count but add
    // neither text nor number
    val sheet = ("<?xml version=\"1.0\"?><worksheet><sheetData>" +
      "<row><c><f>A1+900</f><v>5</v></c><c r=\"B1\"/>" +
      "<c t=\"b\"><v>1</v></c><c><v>0.25</v></c></row>" +
      "</sheetData></worksheet>").getBytes("UTF-8")
    val zip = Archive.zipWrite(Seq(
      ("xl/worksheets/sheet1.xml", sheet, false)))
    assert(Docx.xlsxCells(zip)
      .contains(Docx.XlsxCells("", 3, 525)))
  }

  test("xlsx cells: multi-sheet numeric order and str cells") {
    def sheet(body: String): Array[Byte] =
      ("<worksheet><sheetData><row>" + body +
        "</row></sheetData></worksheet>").getBytes("UTF-8")
    // sheet10 must come AFTER sheet9 (numeric, not lexicographic)
    val zip = Archive.zipWrite(Seq(
      ("xl/worksheets/sheet10.xml",
        sheet("<c t=\"str\"><v>later</v></c>"), false),
      ("xl/worksheets/sheet9.xml",
        sheet("<c t=\"str\"><v>first</v></c>"), false)))
    assert(Docx.xlsxCells(zip)
      .contains(Docx.XlsxCells("first\nlater", 2, 0)))
  }

  test("xlsx cells: malformed inputs refuse, never wrong sums") {
    def zipWith(body: String): Array[Byte] = Archive.zipWrite(Seq(
      ("xl/worksheets/sheet1.xml",
        ("<worksheet><sheetData><row>" + body +
          "</row></sheetData></worksheet>").getBytes("UTF-8"), false)))
    assert(Docx.xlsxCells(null).isEmpty)
    assert(Docx.xlsxCells("PK junk".getBytes).isEmpty)
    // zip with no sheet parts (the strings-only fixture)
    assert(Docx.xlsxCells(Docx.xlsxWrite(Seq("x"), 0)).isEmpty)
    // unknown cell type
    assert(Docx.xlsxCells(
      zipWith("<c t=\"weird\"><v>1</v></c>")).isEmpty)
    // shared index with no sharedStrings part / out of range
    assert(Docx.xlsxCells(
      zipWith("<c t=\"s\"><v>0</v></c>")).isEmpty)
    // non-decimal numeric
    assert(Docx.xlsxCells(zipWith("<c><v>1e9</v></c>")).isEmpty)
    // torn XML
    assert(Docx.xlsxCells(Archive.zipWrite(Seq(
      ("xl/worksheets/sheet1.xml",
        "<worksheet><sheetData><c><v>1".getBytes("UTF-8"),
        false)))).isEmpty)
    // truncated container
    val good = Docx.xlsxCellsWrite(Seq("a"), 3L, 1)
    assert(Docx.xlsxCells(good.take(good.length / 2)).isEmpty)
  }

  test("pptx slides round-trip through all three layouts; numeric " +
      "slide order") {
    val slides = Seq("first slide\nwith two paras", "second",
      "third slide words")
    for (m <- 0 to 2) {
      val got = Docx.pptxText(Docx.pptxWrite(slides, m))
      assert(got.contains(
        Docx.PptxText(slides.mkString("\n"), 3)), s"m=$m")
    }
    // >9 slides: slide10 must come after slide9, not after slide1
    val many = (1 to 12).map(i => s"slide $i")
    val got = Docx.pptxText(Docx.pptxWrite(many, 0)).get
    assert(got.text == many.mkString("\n") && got.nSlides == 12)
    // no slides at all -> None
    val noSlides = Archive.zipWrite(Seq(("ppt/presentation.xml",
      "<p:presentation/>".getBytes("UTF-8"), false)))
    assert(Docx.pptxText(noSlides).isEmpty)
  }

  test("odt round-trips through all three layouts") {
    val text = "plain para\nheading para\ttabbed  double-spaced\n" +
      "third   wide"
    for (m <- 0 to 2) {
      val got = Docx.odtText(Docx.odtWrite(text, m))
      assert(got.contains(Docx.OdtText(text, 3)), s"m=$m")
    }
    for (m <- 0 to 2)
      assert(Docx.odtText(Docx.odtWrite("", m))
        .contains(Docx.OdtText("", 1)), s"m=$m empty")
  }

  test("odt annotation decoys never reach the text or para count") {
    val b = Docx.odtWrite("real one\nreal two", 1)
    val got = Docx.odtText(b).get
    assert(got.text == "real one\nreal two" && got.nParas == 2)
  }

  test("epub round-trips; spine order beats zip order; decoys skip") {
    val text = "chapter text &<escaped>\nsecond para"
    for (m <- 0 to 2) {
      val got = Docx.epubText(Docx.epubWrite(text, "the footer", m))
      assert(got.contains(
        Docx.EpubText(text + "\nthe footer", 2)), s"m=$m")
    }
    // mode 1 stores ch2 before ch1 in the zip AND has script/style
    // + <title> decoys: reading order and exclusion both verified
    val b = Docx.epubWrite("first", "second", 1)
    val got = Docx.epubText(b).get
    assert(got.text == "first\nsecond")
    assert(!got.text.contains("never extracted"))
  }

  test("epub refuses broken container chains") {
    // valid zip, no container.xml
    val noContainer = Archive.zipWrite(Seq(("mimetype",
      "application/epub+zip".getBytes("UTF-8"), false)))
    assert(Docx.epubText(noContainer).isEmpty)
    // container points at a missing OPF
    val container = ("<?xml version=\"1.0\"?><container><rootfiles>" +
      "<rootfile full-path=\"missing.opf\"/></rootfiles>" +
      "</container>").getBytes("UTF-8")
    val danglingOpf = Archive.zipWrite(Seq(
      ("META-INF/container.xml", container, false)))
    assert(Docx.epubText(danglingOpf).isEmpty)
    // spine references a manifest id with no entry -> empty spine
    val good = Docx.epubWrite("x", "y", 0)
    assert(Docx.epubText(good).isDefined)
    assert(Docx.epubText(good.take(good.length / 2)).isEmpty)
  }

  test("decodeBatches integration extracts per-row docx text") {
    val df = Seq((1L, "row one text", 0), (2L, "row two\nsecond", 1),
      (3L, "row three", 2)).toDF("doc_id", "text", "m")
    val docx = Docx.synthDocx(df, "text", "m", "content")
    val out = Multimodal.decodeBatches(docx, "content",
        Docx.docxTextSchema)(Docx.decodeDocxText)
      .select("doc_id", "docx_text", "n_paras")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "row one text", 1),
      (2L, "row two\nsecond", 2), (3L, "row three", 1)))
  }
}
