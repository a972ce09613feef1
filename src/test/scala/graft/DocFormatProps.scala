package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Docx, Mime, Pdf, Rtf}

/** Property-based round-trips for the document-format writers and
  * parsers: arbitrary (printable + unicode + control-ish) text
  * planted through every layout must come back IDENTICAL. These
  * hunt the escaping/encoding edge cases example tests miss.
  */
object DocFormatProps extends Properties("DocFormatProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  // text generator: ASCII incl. XML/RTF-hostile chars, latin-1,
  // BMP unicode, astral pairs, tabs and newlines
  private val hostileChars: Gen[Char] = Gen.frequency(
    (8, Gen.choose(32.toChar, 126.toChar)),
    (2, Gen.oneOf('<', '>', '&', '"', '\'', '\\', '{', '}', '=',
      '?', '-')),
    (2, Gen.oneOf('\n', '\t')),
    (2, Gen.choose(0xa0.toChar, 0xff.toChar)),
    (1, Gen.oneOf('Ω', 'μ', '€', '—', '日', '한', 'ѣ')))

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    cs <- Gen.listOfN(n, hostileChars)
    // occasionally append an astral char (surrogate pair)
    astral <- Gen.oneOf("", "", "𝄞", "😀")
  } yield cs.mkString + astral

  private val modeGen: Gen[Int] = Gen.chooseNum(0, 2)

  property("docx round-trips arbitrary text in every mode") =
    Prop.forAll(textGen, modeGen) { (text, m) =>
      Docx.docxText(Docx.docxWrite(text, m))
        .contains(Docx.DocxText(text,
          1 + text.count(_ == '\n')))
    }

  property("odt round-trips arbitrary text in every mode") =
    Prop.forAll(textGen, modeGen) { (text, m) =>
      Docx.odtText(Docx.odtWrite(text, m)).map(_.text)
        .contains(text)
    }

  property("pptx round-trips arbitrary slides in every mode") =
    Prop.forAll(textGen, textGen, modeGen) { (s1, s2, m) =>
      Docx.pptxText(Docx.pptxWrite(Seq(s1, s2), m))
        .contains(Docx.PptxText(s1 + "\n" + s2, 2))
    }

  property("epub round-trips arbitrary text in every mode") =
    Prop.forAll(textGen, modeGen) { (text, m) =>
      Docx.epubText(Docx.epubWrite(text, "f", m))
        .contains(Docx.EpubText(text + "\nf", 2))
    }

  property("xlsx round-trips arbitrary newline-free items") =
    Prop.forAll(Gen.listOfN(4,
      textGen.map(_.replace('\n', ' '))), modeGen) { (items, m) =>
      Docx.xlsxStrings(Docx.xlsxWrite(items, m))
        .contains(Docx.XlsxStrings(items.mkString("\n"),
          items.length))
    }

  property("rtf round-trips arbitrary text in every mode") =
    Prop.forAll(textGen, modeGen) { (text, m) =>
      Rtf.rtfText(Rtf.rtfWrite(text, m)).map(_.text).contains(text)
    }

  property("eml round-trips arbitrary subject+body in every mode") =
    Prop.forAll(textGen.map(_.replace('\n', ' ')), textGen, modeGen) {
      (subj, body, m) =>
        Mime.emlText(Mime.emlWrite(subj, body, m)) match {
          case Some(Mime.EmlText(s, t, _)) => s == subj && t == body
          case None => false
        }
    }

  property("legacy .doc piece table round-trips arbitrary text") =
    Prop.forAll(textGen) { text =>
      graft.operators.Cfb.docText(graft.operators.Cfb.docWrite(text))
        .map(_.text).contains(text)
    }

  property("legacy .xls SST straddle round-trips arbitrary text") =
    Prop.forAll(textGen, Gen.chooseNum(0L, 9999L)) { (text, seed) =>
      graft.operators.Xls.xlsCells(
          graft.operators.Xls.xlsWrite(text, seed)) match {
        case Some(doc) =>
          val got = doc.cells.iterator
            .filter(_.text != null).map(_.text).mkString
          val centi = doc.cells.iterator.flatMap(_.centi).sum
          got == text && centi == 1113L * seed + 1203L
        case None => false
      }
    }

  property("legacy .ppt slides round-trip arbitrary text") =
    Prop.forAll(textGen, textGen) { (s1, s2) =>
      graft.operators.Ppt.pptText(
          graft.operators.Ppt.pptWrite(Seq(s1, s2))) match {
        case Some(doc) =>
          doc.text == s1 + "\n" + s2 && doc.nSlides == 2 &&
            doc.nTextAtoms == 2
        case None => false
      }
    }

  property("ipynb cells round-trip arbitrary text in every mode") =
    Prop.forAll(textGen, textGen, modeGen) { (md, code, m) =>
      graft.operators.Ipynb.ipynbText(
          graft.operators.Ipynb.ipynbWrite(md, code, m)) match {
        case Some(doc) =>
          doc.text == md + "\n" + code && doc.nCells == 2 &&
            doc.nCodeCells == 1 && doc.language == "python"
        case None => false
      }
    }

  // cue lines: newline-free (a blank line would terminate the cue);
  // an all-whitespace line reads back empty in SRT (the blank-line
  // block rule), verbatim in VTT (the tag wrap keeps it non-blank)
  private val cueGen: Gen[String] =
    textGen.map(_.replace('\n', ' '))

  property("srt cues round-trip with exact durations") =
    Prop.forAll(cueGen, cueGen, Gen.chooseNum(0L, 9999L)) {
      (l1, l2, seed) =>
        val expected = Seq(l1, l2)
          .map(l => if (l.trim.isEmpty) "" else l).mkString("\n")
        graft.operators.Subtitles.srtText(
            graft.operators.Subtitles.srtWrite(Seq(l1, l2), seed)) match {
          case Some(doc) =>
            doc.text == expected && doc.nCues == 2 &&
              doc.durationMs == 2 * (1500 + (seed % 7) * 10)
          case None => false
        }
    }

  property("vtt cues round-trip through tags and entities") =
    Prop.forAll(cueGen, cueGen, Gen.chooseNum(0L, 9999L)) {
      (l1, l2, seed) =>
        graft.operators.Subtitles.vttText(
            graft.operators.Subtitles.vttWrite(Seq(l1, l2), seed)) match {
          case Some(doc) =>
            doc.text == l1 + "\n" + l2 && doc.nCues == 2 &&
              doc.durationMs == 2 * (1500 + (seed % 7) * 10)
          case None => false
        }
    }

  property("feed items round-trip arbitrary text in every mode") =
    Prop.forAll(textGen, textGen, textGen, modeGen) {
      (title, it, body, m) =>
        graft.operators.Feed.feedText(
            graft.operators.Feed.feedWrite(title,
              Seq((it, body)), m)) match {
          case Some(doc) =>
            val want =
              if (body.isEmpty) Seq(it).filter(_.nonEmpty).mkString
              else if (it.isEmpty) body
              else it + "\n" + body
            doc.title == title && doc.text == want && doc.nItems == 1
          case None => false
        }
    }

  property("msg properties round-trip arbitrary text in every mode") =
    Prop.forAll(textGen, textGen, modeGen) { (subj, body, m) =>
      graft.operators.Msg.msgText(
          graft.operators.Msg.msgWrite(subj, body, "s", m)) match {
        case Some(doc) =>
          doc.subject == subj && doc.body == body && doc.sender == "s"
        case None => false
      }
    }

  property("ics event text round-trips in every mode") =
    Prop.forAll(textGen, textGen, Gen.chooseNum(0L, 9999L),
      modeGen) { (summary, desc, seed, m) =>
      graft.operators.Vobject.icsText(
          graft.operators.Vobject.icsWrite(summary, desc, seed,
            m)) match {
        case Some(doc) =>
          val ev1 = Seq(summary, desc).filter(_.nonEmpty)
            .mkString("\n")
          val want = Seq(ev1, "closing event " + (seed % 9))
            .filter(_.nonEmpty).mkString("\n")
          doc.text == want && doc.nEvents == 2 &&
            doc.durationS == 2 * (1800 + (seed % 11) * 60)
        case None => false
      }
    }

  property("vcf FN/ORG round-trip in every mode") =
    Prop.forAll(textGen.map(_.replace('\n', ' ')),
      textGen.map(_.replace('\n', ' ')), modeGen) { (fn, org, m) =>
      graft.operators.Vobject.vcfText(
          graft.operators.Vobject.vcfWrite(fn, org, m)) match {
        case Some(doc) =>
          val want = Seq(fn, org, "card@example.test")
            .filter(_.nonEmpty).mkString("\n")
          doc.text == want && doc.nCards == 1
        case None => false
      }
    }

  property("sqlite rows round-trip arbitrary text incl. overflow") =
    Prop.forAll(textGen, Gen.chooseNum(0L, 9999L)) { (text, seed) =>
      val rows = Seq((1L, seed, text),
        (2L, seed + 1, "long " + ("q" * 900)),
        (3L, seed + 2, "tail"))
      graft.operators.Sqlite.sqliteRead(
          graft.operators.Sqlite.sqliteWrite(rows)) match {
        case Some(doc) =>
          val got = doc.rows("docs")
          got.map(_._1) == Seq(1L, 2L, 3L) &&
            got.head._2(1) == text &&
            got(1)._2(1) == "long " + ("q" * 900) &&
            got.map(_._2(0)) == Seq(seed, seed + 1, seed + 2)
        case None => false
      }
    }

  property("dbf rows round-trip modulo the format's latin-1 world") =
    Prop.forAll(cueGen, cueGen, Gen.chooseNum(0L, 99999L)) {
      (t1, t2, seq) =>
        // the format is fixed-width latin-1: wider chars become '?',
        // trailing pads are indistinguishable from trailing spaces
        def proj(s: String): String = {
          val p = s.take(254).map(c => if (c < 0x100) c else '?')
          var e = p.length
          while (e > 0 && p.charAt(e - 1) == ' ') e -= 1
          p.substring(0, e)
        }
        graft.operators.Dbf.dbfRead(graft.operators.Dbf.dbfWrite(
            Seq((t1.take(254), "body", seq),
              (t2.take(254), "b2", seq + 1)))) match {
          case Some(doc) =>
            doc.rows.length == 2 && doc.nDeleted == 1 &&
              doc.rows(0)(0) == proj(t1) &&
              doc.rows(1)(0) == proj(t2) &&
              doc.rows(0)(2) == seq && doc.rows(1)(2) == seq + 1
          case None => false
        }
    }

  property("avro records round-trip arbitrary text in both codecs") =
    Prop.forAll(textGen, textGen, Gen.chooseNum(-99999L, 99999L),
      Gen.chooseNum(0, 1)) { (b1, b2, id, m) =>
      val rows = Seq((id, b1, true, Option.empty[String]),
        (id + 1, b2, false, Some("n")))
      graft.operators.Avro.avroRead(
          graft.operators.Avro.avroWrite(rows, m)) match {
        case Some(doc) =>
          doc.rows.length == 2 &&
            doc.rows(0)(0) == id && doc.rows(0)(1) == b1 &&
            doc.rows(1)(1) == b2 && doc.rows(0)(3) == null &&
            doc.rows(1)(3) == "n"
        case None => false
      }
    }

  property("markdown body lines round-trip through wrap+escape") =
    Prop.forAll(cueGen, textGen) { (title0, body) =>
      // ATX heading content is whitespace-trimmed per CommonMark —
      // an edge-padded title cannot round-trip by design
      val title = title0.trim
      val lines = body.split("\n", -1).toSeq
      val got = graft.operators.Markdown.mdText(new String(
        graft.operators.Markdown.mdWrite(title, lines, "c()"),
        "UTF-8"))
      val wantLinks = lines.zipWithIndex.count { case (l, i) =>
        i % 4 == 3 && l.trim.nonEmpty
      }
      got.text == title + "\n\n" + body +
        "\n\n\nc()\n\nhtml tag stripped\n" &&
        got.nHeadings == 1 && got.nCodeBlocks == 1 &&
        got.nLinks == wantLinks
    }

  property("pdf font-encoded text round-trips in every mode") =
    Prop.forAll(textGen, modeGen) { (text, m) =>
      Pdf.pdfText(Pdf.pdfWriteFontEncoded(text, m))
        .map(_.text).contains(text)
    }
}
