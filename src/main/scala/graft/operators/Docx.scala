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

  private[operators] final case class DocxFail(msg: String)
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
  private[operators] sealed trait Ev
  private[operators] final case class Open(name: String, selfClose: Boolean,
      attrs: String = "") extends Ev
  private[operators] final case class Close(name: String) extends Ev
  private[operators] final case class Text(s: String, raw: Boolean = false)
    extends Ev

  /** Forward-scan `xml`, invoking `f` per event. Malformed markup
    * (unterminated tag/comment/CDATA) stops the scan via fail — the
    * caller maps that to None.
    */
  private[operators] def scanXml(xml: String)(f: Ev => Unit): Unit = {
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
          // the tag ends at the first '>' OUTSIDE quoted attribute
          // values: <item title="a>b"> is legal XML, and a bare
          // indexOf would truncate the tag and re-emit the remainder
          // as Text for every module riding this scanner
          var gt = -1
          var j = lt + 1
          var quote = ' '
          while (gt < 0 && j < n) {
            val c = xml.charAt(j)
            if (quote != ' ') { if (c == quote) quote = ' ' }
            else if (c == '"' || c == '\'') quote = c
            else if (c == '>') gt = j
            j += 1
          }
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
            val aEnd = if (selfClose) gt - 1 else gt
            val attrs = if (e < aEnd) xml.substring(e, aEnd) else ""
            f(Open(name, selfClose, attrs))
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
      case Open(name, selfClose, _) =>
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
      case Open(name, selfClose, _) =>
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
  // XLSX worksheet cells (sheet XML, not just sharedStrings)
  // ------------------------------------------------------------------

  /** Decoded XLSX cell layer: newline-joined STRING cells (shared
    * refs resolved + inline strings + cached formula strings) in
    * document order across numerically-sorted sheets, the count of
    * value-bearing cells, and the exact centi-unit sum of numeric
    * cells (the modern-format sibling of the BIFF8 RK path,
    * Xls.scala).
    */
  final case class XlsxCells(cellText: String, nCells: Int,
      numCentiSum: Long)

  private val SheetName = "xl/worksheets/sheet([0-9]+)\\.xml".r

  /** Decimal cell string → exact centi-units: sign, integer part,
    * up to 2 fraction digits (further digits truncate toward zero —
    * the fixed-point read, same contract as [[Gpx.microDeg]]).
    * Exponent notation or any non-digit refuses: a sum that cannot
    * be exact must not be produced at all.
    */
  private[graft] def centiCell(s0: String): Long = {
    val s = s0.trim
    if (s.isEmpty) fail("empty numeric cell")
    var i = 0
    var neg = false
    if (s.charAt(0) == '-' || s.charAt(0) == '+') {
      neg = s.charAt(0) == '-'
      i = 1
    }
    var intPart = 0L
    var sawDigit = false
    while (i < s.length && s.charAt(i) != '.') {
      val c = s.charAt(i)
      if (c < '0' || c > '9') fail("non-decimal numeric cell")
      intPart = intPart * 10 + (c - '0')
      if (intPart > (1L << 53)) fail("numeric cell out of range")
      sawDigit = true
      i += 1
    }
    var frac = 0L
    var digits = 0
    if (i < s.length && s.charAt(i) == '.') {
      i += 1
      while (i < s.length && digits < 2) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') fail("non-decimal numeric cell")
        frac = frac * 10 + (c - '0')
        digits += 1
        sawDigit = true
        i += 1
      }
      while (i < s.length) { // sub-centi digits: truncate toward zero
        val c = s.charAt(i)
        if (c < '0' || c > '9') fail("non-decimal numeric cell")
        i += 1
      }
    }
    if (!sawDigit) fail("empty numeric cell")
    while (digits < 2) { frac *= 10; digits += 1 }
    val v = intPart * 100L + frac
    if (neg) -v else v
  }

  /** One worksheet XML → (string cells, n value cells, centi sum).
    * Cell dispatch by the `t` attribute ([ECMA-376] 18.18.11 ST_CellType):
    * `s` shared-string index, `inlineStr` nested `<is><t>` runs
    * (`<rPh>` phonetic decoys excluded like sharedStrings), `str`
    * cached formula string, `b`/`e` counted but neither text nor
    * number, absent/`n` exact centi numeric. `<f>` formula bodies
    * are never values; cells with no value don't count. Unknown
    * cell types refuse — a silently mislabeled column is how sums
    * go wrong at scale.
    */
  private def sheetCells(xml: String, shared: IndexedSeq[String],
      strings: scala.collection.mutable.Builder[String, Seq[String]])
      : (Int, Long) = {
    var nCells = 0
    var centiSum = 0L
    var inC = false
    var cType = ""
    var inV = false
    var inIs = false
    var inT = false
    var inF = false
    var phDepth = 0
    var hasV = false
    var hasIs = false
    var total = 0L
    val v = new java.lang.StringBuilder
    val ist = new java.lang.StringBuilder
    def endCell(): Unit = {
      if (inC) {
        cType match {
          case "s" =>
            if (!hasV) fail("shared-string cell without index")
            val idx =
              try v.toString.trim.toInt
              catch {
                case _: NumberFormatException =>
                  fail("non-integer shared-string index")
              }
            if (idx < 0 || idx >= shared.length)
              fail("shared-string index out of range")
            strings += shared(idx)
            nCells += 1
          case "inlineStr" =>
            if (hasIs) { strings += ist.toString; nCells += 1 }
          case "str" =>
            if (hasV) { strings += v.toString; nCells += 1 }
          case "b" | "e" =>
            if (hasV) nCells += 1
          case "" | "n" =>
            if (hasV) { centiSum += centiCell(v.toString); nCells += 1 }
          case other => fail(s"unknown cell type $other")
        }
      }
      inC = false
    }
    scanXml(xml) {
      case Open(name, selfClose, attrs) =>
        name match {
          case "c" =>
            endCell() // defensive: an unclosed <c> ends at the next
            inC = true
            cType = attrMap(attrs).getOrElse("t", "")
            v.setLength(0); ist.setLength(0)
            hasV = false; hasIs = false
            if (selfClose) inC = false // empty cell: no value
          case "v" if inC && !inF && !selfClose =>
            inV = true; hasV = true; v.setLength(0)
          case "is" if inC && !selfClose => inIs = true; hasIs = true
          case "t" if inIs && phDepth == 0 && !selfClose => inT = true
          case "rPh" if !selfClose => phDepth += 1
          case "f" if inC && !selfClose => inF = true
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "c" => endCell()
          case "v" => inV = false
          case "is" => inIs = false
          case "t" => inT = false
          case "rPh" => if (phDepth > 0) phDepth -= 1
          case "f" => inF = false
          case "row" | "sheetData" | "worksheet" => endCell()
          case _ => ()
        }
      case Text(s, raw) =>
        if (inV && !inF) {
          v.append(if (raw) s else xmlUnescape(s))
          total += s.length
        } else if (inT) {
          ist.append(if (raw) s else xmlUnescape(s))
          total += s.length
        }
        if (total > MaxText) fail("text bomb")
    }
    (nCells, centiSum)
  }

  /** XLSX bytes → the full cell layer: every `xl/worksheets/
    * sheetN.xml` walked in NUMERIC sheet order (sheet10 after
    * sheet9), shared-string references resolved against
    * `xl/sharedStrings.xml` (optional part — absent means any `s`
    * cell refuses as out-of-range). None for non-zip bytes, no
    * sheet parts, or malformed XML/cells — never wrong sums.
    */
  def xlsxCells(b: Array[Byte]): Option[XlsxCells] = {
    if (b == null || b.length < 22) return None
    try {
      Archive.zipEntries(b).flatMap { entries =>
        val sheets = entries.flatMap { e =>
          e.name match {
            case SheetName(n) => Some((n.toInt, e))
            case _ => None
          }
        }.sortBy(_._1)
        if (sheets.isEmpty) return None
        val shared: IndexedSeq[String] =
          entries.find(_.name == "xl/sharedStrings.xml") match {
            case Some(ss) => Archive.zipExtract(b, ss) match {
              case Some(bytes) => sharedStrings(
                new String(bytes, StandardCharsets.UTF_8)).toIndexedSeq
              case None => return None
            }
            case None => IndexedSeq.empty
          }
        val strings = Seq.newBuilder[String]
        var nCells = 0
        var centiSum = 0L
        for ((_, e) <- sheets) {
          val bytes = Archive.zipExtract(b, e).getOrElse(return None)
          val (n, c) = sheetCells(
            new String(bytes, StandardCharsets.UTF_8), shared, strings)
          nCells += n
          centiSum += c
        }
        Some(XlsxCells(strings.result().mkString("\n"), nCells,
          centiSum))
      }
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // PPTX (DrawingML slides)
  // ------------------------------------------------------------------

  /** Decoded PPTX: slide texts joined with one newline + count. */
  final case class PptxText(text: String, nSlides: Int)

  private val SlideName = "ppt/slides/slide([0-9]+)\\.xml".r

  /** One slide's DrawingML → text: `<a:t>` runs concatenated,
    * `<a:p>` paragraphs joined with one newline, `<a:br/>` a newline
    * inside the paragraph.
    */
  private def dmlText(xml: String): String = {
    val out = new java.lang.StringBuilder
    val para = new java.lang.StringBuilder
    var nParas = 0
    var inT = false
    scanXml(xml) {
      case Open(name, selfClose, _) =>
        name match {
          case "a:t" if !selfClose => inT = true
          case "a:br" => para.append('\n')
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "a:t" => inT = false
          case "a:p" =>
            nParas += 1
            if (nParas > 1) out.append('\n')
            out.append(para)
            para.setLength(0)
            if (out.length > MaxText) fail("text bomb")
          case _ => ()
        }
      case Text(s, raw) =>
        if (inT) {
          para.append(if (raw) s else xmlUnescape(s))
          if (para.length > MaxText) fail("text bomb")
        }
    }
    out.toString
  }

  /** PPTX bytes → slide texts in slide-NUMBER order (numeric, not
    * lexicographic — slide10 sorts after slide9). None for non-zip
    * bytes, no slides, or malformed slide XML.
    */
  def pptxText(b: Array[Byte]): Option[PptxText] = {
    if (b == null || b.length < 22) return None
    try {
      Archive.zipEntries(b).flatMap { entries =>
        val slides = entries.flatMap { e =>
          e.name match {
            case SlideName(n) => Some((n.toInt, e))
            case _ => None
          }
        }.sortBy(_._1)
        if (slides.isEmpty) None
        else {
          val texts = slides.map { case (_, e) =>
            Archive.zipExtract(b, e) match {
              case Some(bytes) =>
                dmlText(new String(bytes, StandardCharsets.UTF_8))
              case None => return None
            }
          }
          Some(PptxText(texts.mkString("\n"), slides.length))
        }
      }
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // ODT (OpenDocument text)
  // ------------------------------------------------------------------

  /** Decoded ODT: paragraph-joined text + paragraph count. */
  final case class OdtText(text: String, nParas: Int)

  /** content.xml → text: `<text:p>`/`<text:h>` paragraphs joined
    * with one newline; inside them `<text:tab/>` → TAB,
    * `<text:line-break/>` → newline, `<text:s text:c="n"/>` → n
    * spaces (default 1); `<office:annotation>` spans excluded. Text
    * nodes outside paragraphs (styles, metadata) are ignored.
    */
  private def odfText(xml: String): (String, Int) = {
    val out = new java.lang.StringBuilder
    val para = new java.lang.StringBuilder
    var nParas = 0
    var inP = 0
    var noteDepth = 0
    // the only attribute we need anywhere: text:c on <text:s>
    val cAttr = "text:c\\s*=\\s*\"([0-9]{1,4})\"".r
    scanXml(xml) {
      case Open(name, selfClose, attrs) =>
        name match {
          case "text:p" | "text:h"
              if !selfClose && noteDepth == 0 => inP += 1
          case "office:annotation" if !selfClose => noteDepth += 1
          case "text:tab" if inP > 0 && noteDepth == 0 =>
            para.append('\t')
          case "text:line-break" if inP > 0 && noteDepth == 0 =>
            para.append('\n')
          case "text:s" if inP > 0 && noteDepth == 0 =>
            val n = cAttr.findFirstMatchIn(attrs)
              .map(_.group(1).toInt).getOrElse(1)
            if (n > 0 && n <= 10000) {
              var i = 0
              while (i < n) { para.append(' '); i += 1 }
            }
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "office:annotation" =>
            if (noteDepth > 0) noteDepth -= 1
          case "text:p" | "text:h" =>
            if (inP > 0 && noteDepth == 0) {
              inP -= 1
              if (inP == 0) {
                nParas += 1
                if (nParas > 1) out.append('\n')
                out.append(para)
                para.setLength(0)
                if (out.length > MaxText) fail("text bomb")
              }
            }
          case _ => ()
        }
      case Text(s, raw) =>
        if (inP > 0 && noteDepth == 0) {
          para.append(if (raw) s else xmlUnescape(s))
          if (para.length > MaxText) fail("text bomb")
        }
    }
    (out.toString, nParas)
  }

  /** ODT bytes → text of `content.xml`. None for non-zip bytes, a
    * missing content part, or malformed XML.
    */
  def odtText(b: Array[Byte]): Option[OdtText] = {
    if (b == null || b.length < 22) return None
    try {
      for {
        entries <- Archive.zipEntries(b)
        doc <- entries.find(_.name == "content.xml")
        bytes <- Archive.zipExtract(b, doc)
      } yield {
        val (text, nParas) =
          odfText(new String(bytes, StandardCharsets.UTF_8))
        OdtText(text, nParas)
      }
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // EPUB (zip + XHTML spine)
  // ------------------------------------------------------------------

  /** Decoded EPUB: spine-ordered chapter texts joined with one
    * newline + chapter count.
    */
  final case class EpubText(text: String, nDocs: Int)

  private val AttrRe =
    "([A-Za-z_:][A-Za-z0-9._:-]*)\\s*=\\s*\"([^\"]*)\"".r

  private[operators] def attrMap(attrs: String): Map[String, String] =
    AttrRe.findAllMatchIn(attrs)
      .map(m => m.group(1) -> m.group(2)).toMap

  /** One XHTML content document → text: text nodes inside `<body>`
    * excluding `<script>`/`<style>` subtrees; paragraph-level blocks
    * (p, h1–h6, li, div) break on close, `<br/>` breaks inline;
    * entity unescape as everywhere else.
    */
  private def xhtmlText(xml: String): String = {
    val paras = Seq.newBuilder[String]
    val para = new java.lang.StringBuilder
    var inBody = false
    var skipDepth = 0
    def flush(): Unit = {
      paras += para.toString
      para.setLength(0)
    }
    val blocks = Set("p", "h1", "h2", "h3", "h4", "h5", "h6", "li",
      "div")
    scanXml(xml) {
      case Open(name, selfClose, _) =>
        name match {
          case "body" => inBody = true
          case "script" | "style" if !selfClose => skipDepth += 1
          case "br" if inBody && skipDepth == 0 => para.append('\n')
          case _ => ()
        }
      case Close(name) =>
        name match {
          case "body" => inBody = false
          case "script" | "style" =>
            if (skipDepth > 0) skipDepth -= 1
          case b if blocks.contains(b) && inBody && skipDepth == 0 =>
            flush()
          case _ => ()
        }
      case Text(s, raw) =>
        if (inBody && skipDepth == 0) {
          para.append(if (raw) s else xmlUnescape(s))
          if (para.length > MaxText) fail("text bomb")
        }
    }
    paras.result().mkString("\n")
  }

  /** EPUB bytes → spine-ordered text: META-INF/container.xml names
    * the OPF, the OPF's manifest+spine give the content documents IN
    * READING ORDER (which is not zip order), each read as XHTML.
    * None for a missing/malformed container chain.
    */
  def epubText(b: Array[Byte]): Option[EpubText] = {
    if (b == null || b.length < 22) return None
    try {
      val entries = Archive.zipEntries(b).getOrElse(return None)
      val byName = entries.map(e => e.name -> e).toMap
      def read(name: String): Option[String] =
        byName.get(name).flatMap(Archive.zipExtract(b, _))
          .map(new String(_, StandardCharsets.UTF_8))
      // 1. container.xml → OPF path
      val container = read("META-INF/container.xml")
        .getOrElse(return None)
      var opfPath: String = null
      scanXml(container) {
        case Open("rootfile", _, attrs) =>
          if (opfPath == null)
            attrMap(attrs).get("full-path").foreach(opfPath = _)
        case _ => ()
      }
      if (opfPath == null) return None
      val opfDir = {
        val i = opfPath.lastIndexOf('/')
        if (i < 0) "" else opfPath.substring(0, i + 1)
      }
      // 2. OPF: manifest id→href, spine idrefs in order
      val opf = read(opfPath).getOrElse(return None)
      val manifest = Map.newBuilder[String, String]
      val spine = Seq.newBuilder[String]
      scanXml(opf) {
        case Open("item", _, attrs) =>
          val a = attrMap(attrs)
          for (id <- a.get("id"); href <- a.get("href"))
            manifest += id -> href
        case Open("itemref", _, attrs) =>
          attrMap(attrs).get("idref").foreach(spine += _)
        case _ => ()
      }
      val hrefOf = manifest.result()
      val docs = spine.result().flatMap(hrefOf.get)
      if (docs.isEmpty) return None
      val texts = docs.map { href =>
        read(opfDir + href) match {
          case Some(xml) => xhtmlText(xml)
          case None => return None
        }
      }
      Some(EpubText(texts.mkString("\n"), docs.length))
    } catch {
      case DocxFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Real EPUB fixture: mimetype + container.xml + OPF + two
    * chapters — chapter 1 carries `text` as `<p>` paragraphs,
    * chapter 2 the `footer`. mode 1 stores chapter 2 FIRST in the
    * zip and adds script/style decoys (spine order must win);
    * mode 2 routes newlines through `<br/>` in one paragraph.
    */
  def epubWrite(text: String, footer: String, mode: Int)
      : Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def chapter(s: String): String = {
      val body = m match {
        case 2 =>
          "<p>" + s.split("\n", -1).map(esc).mkString("<br/>") + "</p>"
        case _ =>
          s.split("\n", -1).map(p => "<p>" + esc(p) + "</p>").mkString
      }
      val decoy =
        if (m == 1)
          "<script>var x = 'never extracted';</script>" +
            "<style>p { color: red }</style>"
        else ""
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "\n<html xmlns=\"http://www.w3.org/1999/xhtml\"><head>" +
        "<title>never extracted either</title></head><body>" + decoy +
        body + "</body></html>"
    }
    val container =
      "<?xml version=\"1.0\"?><container version=\"1.0\" " +
        "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/></rootfiles>" +
        "</container>"
    val opf =
      "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/" +
        "2007/opf\" version=\"3.0\"><metadata/><manifest>" +
        "<item id=\"c1\" href=\"ch1.xhtml\" " +
        "media-type=\"application/xhtml+xml\"/>" +
        "<item id=\"c2\" href=\"ch2.xhtml\" " +
        "media-type=\"application/xhtml+xml\"/></manifest>" +
        "<spine><itemref idref=\"c1\"/><itemref idref=\"c2\"/>" +
        "</spine></package>"
    val ch1 = ("OEBPS/ch1.xhtml",
      chapter(text).getBytes(StandardCharsets.UTF_8), m != 0)
    val ch2 = ("OEBPS/ch2.xhtml",
      chapter(footer).getBytes(StandardCharsets.UTF_8), m != 0)
    val chapters = if (m == 1) Seq(ch2, ch1) else Seq(ch1, ch2)
    Archive.zipWrite(Seq(
      ("mimetype", "application/epub+zip"
        .getBytes(StandardCharsets.UTF_8), false),
      ("META-INF/container.xml",
        container.getBytes(StandardCharsets.UTF_8), false),
      ("OEBPS/content.opf",
        opf.getBytes(StandardCharsets.UTF_8), m != 0)) ++ chapters)
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

  val xlsxCellsSchema: StructType = StructType(Seq(
    StructField("cell_text", StringType),
    StructField("n_cells", IntegerType),
    StructField("num_centi_sum", LongType)))

  def decodeXlsxCells(bytes: Array[Byte]): Seq[Any] =
    xlsxCells(bytes) match {
      case Some(XlsxCells(t, n, c)) => Seq[Any](t, n, c)
      case None => Seq[Any](null, null, null)
    }

  // ------------------------------------------------------------------
  // fixture writers — the planted text must come back IDENTICAL
  // ------------------------------------------------------------------

  /** Split into n-char runs without ever cutting a surrogate pair —
    * `String.grouped` would, and a lone surrogate dies in UTF-8.
    */
  private def groupedSafe(s: String, n: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      var e = math.min(i + n, s.length)
      if (e < s.length && Character.isHighSurrogate(s.charAt(e - 1)) &&
        Character.isLowSurrogate(s.charAt(e))) e += 1
      out += s.substring(i, e)
      i = e
    }
    out.result()
  }

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
          val gs = groupedSafe(p, 7)
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
        val gs = groupedSafe(s, 5)
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

  /** Real XLSX-with-worksheets fixture. Cell VALUES are identical in
    * every mode (the SQL oracle must be mode-independent); modes vary
    * only the XML encoding:
    *  - mode 0 (stored): shared-ref cells + plain `<is><t>` inline +
    *    minimal decimal forms (trailing zeros stripped);
    *  - mode 1 (deflated): inline string as rich `<r><t>` runs with
    *    an `<rPh>` decoy, full 2-decimal forms, explicit `t="n"`;
    *  - mode 2 (deflated): the numeric row lives in sheet2.xml (the
    *    numeric-sheet-order path), a `<f>` formula decoy wraps one
    *    number's cached value, plus empty/self-closed cell decoys
    *    and a style attribute.
    * Planted values (seed = doc id): shared cells = `words`, one
    * inline "inline &lt;seed&gt;", numerics seed·7+1, (seed·13+3)
    * centi, seed+5, (seed·3+7) centi → centi sum 816·seed + 610 and
    * n_cells = |words| + 5, both closed-form for the oracle.
    */
  def xlsxCellsWrite(words: Seq[String], seed: Long, mode: Int)
      : Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    require(seed >= 0 && seed < (1L << 40), s"seed $seed out of range")
    def centiStr(c: Long): String = {
      val full = s"${c / 100}.${"%02d".format(c % 100)}"
      if (m == 0) { // minimal form: strip trailing zeros, bare int
        val t = full.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      } else full
    }
    val tAttr = if (m == 1) " t=\"n\"" else ""
    val sharedXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "\n<sst xmlns=\"http://schemas.openxmlformats.org/" +
        "spreadsheetml/2006/main\" count=\"" + words.length +
        "\" uniqueCount=\"" + words.length + "\">" +
        words.map(w => "<si><t xml:space=\"preserve\">" + esc(w) +
          "</t></si>").mkString + "</sst>"
    val sharedCells = words.indices.map(i =>
      s"""<c r="A$i" t="s"><v>$i</v></c>""").mkString
    val inlineCell = m match {
      case 1 =>
        "<c t=\"inlineStr\"><is><r><rPr><b/></rPr>" +
          "<t xml:space=\"preserve\">inline </t></r><r><t>" + seed +
          "</t></r><rPh sb=\"0\" eb=\"1\"><t>decoy</t></rPh></is></c>"
      case _ =>
        "<c t=\"inlineStr\"><is><t xml:space=\"preserve\">inline " +
          seed + "</t></is></c>"
    }
    val n4 = centiStr(seed * 3 + 7)
    val numCells =
      s"""<c$tAttr><v>${seed * 7 + 1}</v></c>""" +
        s"""<c$tAttr><v>${centiStr(seed * 13 + 3)}</v></c>""" +
        s"""<c s="5"$tAttr><v>${seed + 5}</v></c>""" +
        (if (m == 2)
          s"""<c><f>SUM(A1:B1)</f><v>$n4</v></c><c r="Z9"/><c/>"""
        else s"""<c$tAttr><v>$n4</v></c>""")
    def sheetXml(rows: String): String =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/" +
        "spreadsheetml/2006/main\"><sheetData>" + rows +
        "</sheetData></worksheet>"
    val deflate = m != 0
    val sheetParts =
      if (m == 2) Seq(
        ("xl/worksheets/sheet1.xml",
          sheetXml("<row r=\"1\">" + sharedCells + inlineCell +
            "</row>").getBytes(StandardCharsets.UTF_8), deflate),
        ("xl/worksheets/sheet2.xml",
          sheetXml("<row r=\"1\">" + numCells + "</row>")
            .getBytes(StandardCharsets.UTF_8), deflate))
      else Seq(
        ("xl/worksheets/sheet1.xml",
          sheetXml("<row r=\"1\">" + sharedCells + inlineCell +
            "</row><row r=\"2\">" + numCells + "</row>")
            .getBytes(StandardCharsets.UTF_8), deflate))
    Archive.zipWrite(
      ("[Content_Types].xml",
        ContentTypes.getBytes(StandardCharsets.UTF_8), deflate) +:
        ("xl/workbook.xml",
          ("<?xml version=\"1.0\"?><workbook xmlns=\"http://schemas." +
            "openxmlformats.org/spreadsheetml/2006/main\"><sheets>" +
            "<sheet name=\"S1\" sheetId=\"1\"/></sheets></workbook>")
            .getBytes(StandardCharsets.UTF_8), false) +:
        ("xl/sharedStrings.xml",
          sharedXml.getBytes(StandardCharsets.UTF_8), deflate) +:
        sheetParts)
  }

  /** Real PPTX fixture: one zip entry per slide (slide numbers can
    * exceed 9 — the reader must sort numerically). Within a slide,
    * text paragraphs split on newline. mode 0: one run per
    * paragraph; mode 1: runs split every 6 chars; mode 2: ONE
    * paragraph whose newlines route through `<a:br/>`.
    */
  def pptxWrite(slides: Seq[String], mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def run(t: String): String =
      "<a:r><a:rPr lang=\"en-US\"/><a:t>" + esc(t) + "</a:t></a:r>"
    def para(p: String): String = {
      val runs = m match {
        case 1 =>
          val gs = groupedSafe(p, 6)
          (if (gs.isEmpty) Seq("") else gs).map(run).mkString
        case _ => run(p)
      }
      "<a:p><a:pPr/>" + runs + "</a:p>"
    }
    def slideXml(s: String): String = {
      val body = m match {
        case 2 =>
          "<a:p>" + s.split("\n", -1).map(run)
            .mkString("<a:br/>") + "</a:p>"
        case _ => s.split("\n", -1).map(para).mkString
      }
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "\n<p:sld xmlns:a=\"http://schemas.openxmlformats.org/" +
        "drawingml/2006/main\" xmlns:p=\"http://schemas." +
        "openxmlformats.org/presentationml/2006/main\"><p:cSld>" +
        "<p:spTree><p:sp><p:txBody><a:bodyPr/>" + body +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    }
    val deflate = m != 0
    val slideEntries = slides.zipWithIndex.map { case (s, i) =>
      (s"ppt/slides/slide${i + 1}.xml",
        slideXml(s).getBytes(StandardCharsets.UTF_8), deflate)
    }
    Archive.zipWrite(
      ("[Content_Types].xml",
        ContentTypes.getBytes(StandardCharsets.UTF_8), false) +:
        ("ppt/presentation.xml",
          ("<?xml version=\"1.0\"?><p:presentation xmlns:p=\"http://" +
            "schemas.openxmlformats.org/presentationml/2006/main\"/>")
            .getBytes(StandardCharsets.UTF_8), false) +:
        slideEntries)
  }

  /** Real ODT fixture. mode 0: plain `<text:p>` paragraphs; mode 1:
    * odd paragraphs as `<text:h>` headings plus an
    * `<office:annotation>` decoy; mode 2: TABs via `<text:tab/>`
    * and space runs of 2+ via `<text:s text:c="n"/>`.
    */
  def odtWrite(text: String, mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def spaceEncode(p: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (c == '\t') { sb.append("<text:tab/>"); i += 1 }
        else if (c == ' ') {
          var j = i
          while (j < p.length && p.charAt(j) == ' ') j += 1
          val n = j - i
          if (n >= 2) sb.append(s"""<text:s text:c="$n"/>""")
          else sb.append(' ')
          i = j
        } else { sb.append(esc(c.toString)); i += 1 }
      }
      sb.toString
    }
    val paras = text.split("\n", -1).toSeq.zipWithIndex.map {
      case (p, i) =>
        val inner = if (m == 2) spaceEncode(p) else esc(p)
        val decoy =
          if (m == 1 && i == 0)
            "<office:annotation><text:p>reviewer note decoy" +
              "</text:p></office:annotation>"
          else ""
        if (m == 1 && i % 2 == 1)
          s"""<text:h text:outline-level="1">$decoy$inner</text:h>"""
        else s"<text:p>$decoy$inner</text:p>"
    }
    val content =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "\n<office:document-content xmlns:office=\"urn:oasis:names:" +
        "tc:opendocument:xmlns:office:1.0\" xmlns:text=\"urn:oasis:" +
        "names:tc:opendocument:xmlns:text:1.0\"><office:body>" +
        "<office:text>" + paras.mkString +
        "</office:text></office:body></office:document-content>"
    Archive.zipWrite(Seq(
      ("mimetype",
        "application/vnd.oasis.opendocument.text"
          .getBytes(StandardCharsets.UTF_8), false),
      ("content.xml",
        content.getBytes(StandardCharsets.UTF_8), m != 0),
      ("styles.xml",
        ("<?xml version=\"1.0\"?><office:document-styles " +
          "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:" +
          "office:1.0\"/>").getBytes(StandardCharsets.UTF_8), false)))
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

  val pptxTextSchema: StructType = StructType(Seq(
    StructField("pptx_text", StringType),
    StructField("n_slides", IntegerType)))

  def decodePptxText(bytes: Array[Byte]): Seq[Any] =
    pptxText(bytes) match {
      case Some(PptxText(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  val odtTextSchema: StructType = StructType(Seq(
    StructField("odt_text", StringType),
    StructField("n_paras", IntegerType)))

  def decodeOdtText(bytes: Array[Byte]): Seq[Any] =
    odtText(bytes) match {
      case Some(OdtText(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  val epubTextSchema: StructType = StructType(Seq(
    StructField("epub_text", StringType),
    StructField("n_docs", IntegerType)))

  def decodeEpubText(bytes: Array[Byte]): Seq[Any] =
    epubText(bytes) match {
      case Some(EpubText(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  /** Per-row EPUB synthesizer: chapter 1 carries the doc text,
    * chapter 2 a deterministic `c2 <id>` footer — spine ordering
    * (vs zip order, which mode 1 scrambles) is part of what the
    * oracle verifies.
    */
  def synthEpub(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ti, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+
          epubWrite(text, "c2 " + r.get(ii), r.getInt(mi)))
      }
    }(enc)
  }

  /** Per-row PPTX synthesizer: slide 1 carries the doc text, slide 2
    * a deterministic `s2 <id>` footer — multi-slide ordering is part
    * of what the oracle verifies.
    */
  def synthPptx(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ti, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val slides = Seq(text, "s2 " + r.get(ii))
        Row.fromSeq(r.toSeq :+ pptxWrite(slides, r.getInt(mi)))
      }
    }(enc)
  }

  /** Per-row ODT synthesizer. */
  def synthOdt(df: DataFrame, textCol: String, modeCol: String,
      outCol: String): DataFrame = {
    val (ti, mi) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ odtWrite(text, r.getInt(mi)))
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

  /** Per-row worksheet-bearing XLSX synthesizer: shared cells = the
    * doc text split on spaces, seed-derived numeric/inline cells
    * (see [[xlsxCellsWrite]]).
    */
  def synthXlsxCells(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ti, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val words = text.split(" ", -1).toSeq
        Row.fromSeq(r.toSeq :+
          xlsxCellsWrite(words, r.getLong(ii), r.getInt(mi)))
      }
    }(enc)
  }
}
