package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** OOXML text extraction — DOCX (WordprocessingML) and XLSX shared
  * strings — composed from the existing ZIP walk
  * ([[Archive.zipEntries]]/[[Archive.zipExtract]], full local-header
  * + CRC verification) and a from-scratch bounded XML scanner. A
  * high-quality crawl format that previously yielded zero tokens.
  *
  * Scope (same honest-refusal contract as the other codecs): text of
  * `word/document.xml` — `<w:t>` runs, `<w:tab/>` → TAB,
  * `<w:br/>`/`<w:cr/>` → newline, paragraphs joined with one
  * newline; `<w:instrText>` field codes and comments excluded.
  * XLSX: `xl/sharedStrings.xml` `<si>` items (rich-text runs
  * concatenated, `<rPh>` phonetic guides excluded). Encrypted (CFB)
  * or malformed containers → None, never garbage.
  *
  * Reference behavior studied: pytrousse has no document-format
  * layer at all (pandas CSV/Excel-via-openpyxl only,
  * /root/reference/src/trousse/dataset.py:1); this operator is part
  * of the beyond-parity crawl-curation surface, like [[Pdf]].
  */
object Docx {

  /** Decoded DOCX: paragraph-joined text + paragraph count. */
  final case class DocxText(text: String, nParas: Int)

  /** Decoded XLSX shared strings: newline-joined + item count. */
  final case class XlsxStrings(text: String, nStrings: Int)

  private val MaxText = 64 << 20

  private final case class DocxFail(msg: String)
    extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw DocxFail(msg)

  // ------------------------------------------------------------------
  // minimal XML machinery (bounded, entity-aware, namespace-literal)
  // ------------------------------------------------------------------

  /** Unescape the five XML entities plus numeric character
    * references. Unknown entities pass through literally (crawl
    * reality: half-escaped documents).
    */
  private[operators] def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "lt" => "<"
            case "gt" => ">"
            case "amp" => "&"
            case "quot" => "\""
            case "apos" => "'"
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try {
                val cp = Integer.parseInt(ent.substring(2), 16)
                if (Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ if ent.startsWith("#") =>
              try {
                val cp = Integer.parseInt(ent.substring(1))
                if (Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  /** One scanned XML event: start/end/self-closing tag with its name,
    * or a text span. The scanner never allocates a tree — one forward
    * pass, comments/PIs/CDATA/DOCTYPE handled in place.
    */
  private sealed trait Ev
  private final case class Open(name: String, selfClose: Boolean)
    extends Ev
  private final case class Close(name: String) extends Ev
  private final case class Text(s: String, raw: Boolean = false)
    extends Ev

  /** Forward-scan `xml`, invoking `f` per event. Malformed markup
    * (unterminated tag/comment/CDATA) stops the scan via fail — the
    * caller maps that to None.
    */
  private def scanXml(xml: String)(f: Ev => Unit): Unit = {
    val n = xml.length
    var i = 0
    var depth = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) {
        if (i < n) f(Text(xml.substring(i)))
        i = n
      } else {
        if (lt > i) f(Text(xml.substring(i, lt)))
        if (xml.startsWith("<!--", lt)) {
          val e = xml.indexOf("-->", lt + 4)
          if (e < 0) fail("unterminated comment")
          i = e + 3
        } else if (xml.startsWith("<![CDATA[", lt)) {
          val e = xml.indexOf("]]>", lt + 9)
          if (e < 0) fail("unterminated CDATA")
          f(Text(xml.substring(lt + 9, e), raw = true))
          i = e + 3
        } else if (xml.startsWith("<?", lt)) {
          val e = xml.indexOf("?>", lt + 2)
          if (e < 0) fail("unterminated PI")
          i = e + 2
        } else if (xml.startsWith("<!", lt)) {
          val e = xml.indexOf('>', lt + 2)
          if (e < 0) fail("unterminated declaration")
          i = e + 1
        } else {
          val gt = xml.indexOf('>', lt + 1)
          if (gt < 0) fail("unterminated tag")
          val closing = xml.charAt(lt + 1) == '/'
          val selfClose = xml.charAt(gt - 1) == '/'
          val from = if (closing) lt + 2 else lt + 1
          var e = from
          while (e < gt && !Character.isWhitespace(xml.charAt(e)) &&
            xml.charAt(e) != '/') e += 1
          val name = xml.substring(from, e)
          if (closing) {
            depth -= 1
            if (depth < 0) fail("unbalanced close tag")
            f(Close(name))
          } else {
            if (!selfClose) depth += 1
            f(Open(name, selfClose))
          }
          i = gt + 1
        }
      }
    }
    if (depth != 0) fail("unclosed elements at EOF")
  }

  // ------------------------------------------------------------------
  // WordprocessingML → text
  // ------------------------------------------------------------------

  /** document.xml → (paragraph-joined text, paragraph count).
    * Text is captured only inside `<w:t>` (not `<w:instrText>` field
    * codes, not property values); `<w:tab/>` → TAB, `<w:br/>` and
    * `<w:cr/>` → newline inside the paragraph; each `</w:p>` closes
    * a paragraph, paragraphs join with one newline.
    */
  private def wmlText(xml: String): (String, Int) = {
    val out = new java.lang.StringBuilder
    val para = new java.lang.StringBuilder
    var nParas = 0
    var inT = false
    var skipDepth = 0 // inside w:instrText or other excluded spans
    scanXml(xml) {
      case Open(name, selfClose) =>
        name match {
          case "w:t" if skipDepth == 0 && !selfClose => inT = true
          case "w:tab" if skipDepth == 0 && selfClose =>
            para.append('\t')
          case "w:br" | "w:cr" if skipDepth == 0 => para.append('\n')
          case "w:instrText" if !selfClose => skipDepth += 1
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "w:t" => inT = false
          case "w:instrText" => if (skipDepth > 0) skipDepth -= 1
          case "w:p" =>
            nParas += 1
            if (nParas > 1) out.append('\n')
            out.append(para)
            para.setLength(0)
            if (out.length > MaxText) fail("text bomb")
          case _ => ()
        }
      case Text(s, raw) =>
        if (inT && skipDepth == 0) {
          para.append(if (raw) s else xmlUnescape(s))
          if (para.length > MaxText) fail("text bomb")
        }
    }
    (out.toString, nParas)
  }

  /** DOCX bytes → text. None when the container is not a valid ZIP,
    * carries no `word/document.xml` (e.g. CFB-encrypted OOXML — the
    * magic is not even PK), or the XML is malformed.
    */
  def docxText(b: Array[Byte]): Option[DocxText] = {
    if (b == null || b.length < 22) return None
    try {
      for {
        entries <- Archive.zipEntries(b)
        doc <- entries.find(_.name == "word/document.xml")
        bytes <- Archive.zipExtract(b, doc)
      } yield {
        val (text, nParas) =
          wmlText(new String(bytes, StandardCharsets.UTF_8))
        DocxText(text, nParas)
      }
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // XLSX shared strings
  // ------------------------------------------------------------------

  /** sharedStrings.xml → one row per `<si>`: plain `<t>` or
    * rich-text `<r><t>` runs concatenated; `<rPh>` phonetic runs
    * excluded per ECMA-376.
    */
  private def sharedStrings(xml: String): Seq[String] = {
    val items = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var inSi = false
    var inT = false
    var phDepth = 0
    var total = 0L
    scanXml(xml) {
      case Open(name, selfClose) =>
        name match {
          case "si" => inSi = true; cur.setLength(0)
          case "rPh" if !selfClose => phDepth += 1
          case "t" if inSi && phDepth == 0 && !selfClose => inT = true
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "si" =>
            if (inSi) { items += cur.toString; inSi = false }
          case "rPh" => if (phDepth > 0) phDepth -= 1
          case "t" => inT = false
          case _ => ()
        }
      case Text(s, raw) =>
        if (inT) {
          cur.append(if (raw) s else xmlUnescape(s))
          total += s.length
          if (total > MaxText) fail("text bomb")
        }
    }
    items.result()
  }

  /** XLSX bytes → newline-joined shared strings + count. None for
    * non-ZIP bytes or a missing/malformed sharedStrings part.
    */
  def xlsxStrings(b: Array[Byte]): Option[XlsxStrings] = {
    if (b == null || b.length < 22) return None
    try {
      for {
        entries <- Archive.zipEntries(b)
        ss <- entries.find(_.name == "xl/sharedStrings.xml")
        bytes <- Archive.zipExtract(b, ss)
      } yield {
        val items =
          sharedStrings(new String(bytes, StandardCharsets.UTF_8))
        XlsxStrings(items.mkString("\n"), items.length)
      }
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // decode kernels (Multimodal.decodeBatches plumbing)
  // ------------------------------------------------------------------

  val docxTextSchema: StructType = StructType(Seq(
    StructField("docx_text", StringType),
    StructField("n_paras", IntegerType)))

  def decodeDocxText(bytes: Array[Byte]): Seq[Any] =
    docxText(bytes) match {
      case Some(DocxText(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  val xlsxStringsSchema: StructType = StructType(Seq(
    StructField("xlsx_text", StringType),
    StructField("n_strings", IntegerType)))

  def decodeXlsxStrings(bytes: Array[Byte]): Seq[Any] =
    xlsxStrings(bytes) match {
      case Some(XlsxStrings(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  // ------------------------------------------------------------------
  // fixture writers — the planted text must come back IDENTICAL
  // ------------------------------------------------------------------

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  // styles decoy: realistic non-document part the extractor must skip
  private val Styles =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
      |<w:style w:type="paragraph" w:styleId="Normal"><w:name w:val="Normal"/></w:style>
      |</w:styles>""".stripMargin

  /** Real DOCX fixture: text split on newline into `<w:p>`
    * paragraphs. mode 0: one run per paragraph, stored entries;
    * mode 1: runs split every 7 chars with run properties, deflated
    * entries; mode 2: adds decoys the extractor must skip — an XML
    * comment wrapping a fake `<w:t>`, a `<w:instrText>` field code,
    * and TAB characters routed through `<w:tab/>` elements.
    */
  def docxWrite(text: String, mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val paras = text.split("\n", -1).toSeq
    def run(t: String): String =
      "<w:r><w:rPr><w:sz w:val=\"22\"/></w:rPr>" +
        "<w:t xml:space=\"preserve\">" + esc(t) + "</w:t></w:r>"
    def paraXml(p: String): String = {
      val runs: String = m match {
        case 1 =>
          val gs = p.grouped(7).toSeq
          (if (gs.isEmpty) Seq("") else gs).map(run).mkString
        case 2 =>
          // TABs through <w:tab/>; split the rest into runs at tabs
          val parts = p.split("\t", -1).toSeq
          parts.map(run).mkString("<w:r><w:tab/></w:r>")
        case _ => run(p)
      }
      val decoy =
        if (m == 2)
          "<!-- <w:t>comment decoy never extracted</w:t> -->" +
            "<w:r><w:instrText xml:space=\"preserve\"> PAGE " +
            "</w:instrText></w:r>"
        else ""
      "<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>" + decoy + runs +
        "</w:p>"
    }
    val doc =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "\n<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
        "wordprocessingml/2006/main\"><w:body>" +
        paras.map(paraXml).mkString +
        "<w:sectPr><w:pgSz w:w=\"11906\" w:h=\"16838\"/></w:sectPr>" +
        "</w:body></w:document>"
    val deflate = m != 0
    Archive.zipWrite(Seq(
      ("[Content_Types].xml",
        ContentTypes.getBytes(StandardCharsets.UTF_8), deflate),
      ("_rels/.rels", Rels.getBytes(StandardCharsets.UTF_8), false),
      ("word/styles.xml",
        Styles.getBytes(StandardCharsets.UTF_8), deflate),
      ("word/document.xml",
        doc.getBytes(StandardCharsets.UTF_8), deflate)))
  }

  /** Real XLSX fixture: items become `<si>` entries. mode 0: plain
    * `<t>`; mode 1: rich-text runs split every 5 chars; mode 2: adds
    * an `<rPh>` phonetic decoy per item.
    */
  def xlsxWrite(items: Seq[String], mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def si(s: String): String = m match {
      case 1 =>
        val gs = s.grouped(5).toSeq
        "<si>" + (if (gs.isEmpty) Seq("") else gs).map(g =>
          "<r><rPr><b/></rPr><t xml:space=\"preserve\">" + esc(g) +
            "</t></r>").mkString + "</si>"
      case 2 =>
        "<si><r><t xml:space=\"preserve\">" + esc(s) + "</t></r>" +
          "<rPh sb=\"0\" eb=\"1\"><t>phonetic decoy</t></rPh></si>"
      case _ =>
        "<si><t xml:space=\"preserve\">" + esc(s) + "</t></si>"
    }
    val xml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "\n<sst xmlns=\"http://schemas.openxmlformats.org/" +
        "spreadsheetml/2006/main\" count=\"" + items.length +
        "\" uniqueCount=\"" + items.length + "\">" +
        items.map(si).mkString + "</sst>"
    Archive.zipWrite(Seq(
      ("[Content_Types].xml",
        ContentTypes.getBytes(StandardCharsets.UTF_8), m != 0),
      ("xl/workbook.xml",
        ("<?xml version=\"1.0\"?><workbook xmlns=\"http://schemas." +
          "openxmlformats.org/spreadsheetml/2006/main\"><sheets>" +
          "<sheet name=\"S1\" sheetId=\"1\"/></sheets></workbook>")
          .getBytes(StandardCharsets.UTF_8), false),
      ("xl/sharedStrings.xml",
        xml.getBytes(StandardCharsets.UTF_8), m != 0)))
  }

  // ------------------------------------------------------------------
  // Spark plumbing (map-only mapPartitions, same idiom as Pdf)
  // ------------------------------------------------------------------

  /** Per-row DOCX synthesizer. */
  def synthDocx(df: DataFrame, textCol: String, modeCol: String,
      outCol: String): DataFrame = {
    val (ti, mi) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ docxWrite(text, r.getInt(mi)))
      }
    }(enc)
  }

  /** Per-row XLSX synthesizer: the doc text splits on spaces into
    * `nCol`-capped shared-string items.
    */
  def synthXlsx(df: DataFrame, textCol: String, modeCol: String,
      outCol: String): DataFrame = {
    val (ti, mi) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val items = text.split(" ", -1).toSeq
        Row.fromSeq(r.toSeq :+ xlsxWrite(items, r.getInt(mi)))
      }
    }(enc)
  }
}
