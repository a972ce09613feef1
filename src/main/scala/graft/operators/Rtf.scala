package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** RTF text extraction — the dominant legacy rich-text format a
  * long-tail crawl still carries (old .doc exports, email bodies,
  * clipboard dumps). From-scratch control-word parser over the RTF
  * 1.x grammar: `{...}` group nesting with inherited state,
  * `\word[-]N` control words, `\'hh` code-page bytes, `\uN` Unicode
  * escapes with the `\ucN` fallback-skip protocol, destination
  * groups (fonttbl/colortbl/stylesheet/info/pict and every starred
  * `{\*\...}`) excluded, `\par`/`\line` → newline, `\tab` → TAB.
  * Raw CR/LF in the source are ignored per spec. Malformed input
  * (no `{\rtf` magic, unbalanced groups) → None, never garbage.
  *
  * Reference behavior studied: pytrousse has no document layer
  * (/root/reference/src/trousse/dataset.py:1); beyond-parity crawl
  * surface like [[Pdf]] and [[Docx]].
  */
object Rtf {

  /** Decoded RTF: text + paragraph count (`\par` breaks + 1). */
  final case class RtfText(text: String, nParas: Int)

  private val MaxText = 64 << 20

  private object RtfFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** Destinations whose content is formatting/object data, not
    * document text.
    */
  private val SkipDests = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "object", "header", "footer", "footnote",
    "annotation", "field")

  private def cp1252: Charset = Charset.forName("windows-1252")

  /** Parse RTF bytes to text. None unless the input starts with
    * `{\rtf` and the group structure balances.
    */
  def rtfText(b: Array[Byte]): Option[RtfText] = {
    if (b == null || b.length < 6) return None
    val s = new String(b, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return None
    try {
      val out = new java.lang.StringBuilder
      var nParas = 1
      // group state: (skipping, ucSkip)
      var skip = false
      var uc = 1
      val stack = scala.collection.mutable.ArrayBuffer[(Boolean, Int)]()
      var pendingSkip = 0 // \uN fallback chars to swallow
      var cs: Charset = cp1252
      var i = 0
      val n = s.length
      def emit(t: String): Unit =
        if (!skip && pendingSkip == 0) {
          out.append(t)
          if (out.length > MaxText) throw RtfFail
        }
      while (i < n) {
        val c = s.charAt(i)
        c match {
          case '{' =>
            stack += ((skip, uc))
            if (stack.length > 256) throw RtfFail
            i += 1
            // a starred destination {\*\word ...} is always skipped
            if (i + 1 < n && s.charAt(i) == '\\' &&
              s.charAt(i + 1) == '*') {
              skip = true
              i += 2
            }
          case '}' =>
            if (stack.isEmpty) throw RtfFail
            val (ps, pu) = stack.remove(stack.length - 1)
            skip = ps; uc = pu
            i += 1
          case '\r' | '\n' => i += 1 // raw newlines are ignored
          case '\\' =>
            if (i + 1 >= n) throw RtfFail
            val c1 = s.charAt(i + 1)
            if (c1 == '\\' || c1 == '{' || c1 == '}') {
              if (pendingSkip > 0) pendingSkip -= 1 else emit(c1.toString)
              i += 2
            } else if (c1 == '\'') {
              if (i + 3 >= n) throw RtfFail
              val hex = s.substring(i + 2, i + 4)
              val v = Integer.parseInt(hex, 16)
              if (pendingSkip > 0) pendingSkip -= 1
              else emit(new String(Array(v.toByte), cs))
              i += 4
            } else if (c1 == '~') { emit("\u00a0"); i += 2 }
            else if (c1 == '-') { i += 2 } // optional hyphen
            else if (c1 == '_') { emit("\u2011"); i += 2 }
            else if (!Character.isLetter(c1)) {
              // unknown control symbol: ignored
              i += 2
            } else {
              // control word: letters, optional signed number,
              // optional one trailing space
              var j = i + 1
              while (j < n && Character.isLetter(s.charAt(j))) j += 1
              val word = s.substring(i + 1, j)
              var neg = false
              var num = -1L
              if (j < n && (s.charAt(j) == '-' ||
                Character.isDigit(s.charAt(j)))) {
                if (s.charAt(j) == '-') { neg = true; j += 1 }
                num = 0
                while (j < n && Character.isDigit(s.charAt(j))) {
                  num = math.min(num * 10 + (s.charAt(j) - '0'),
                    Int.MaxValue.toLong)
                  j += 1
                }
                if (neg) num = -num
              }
              if (j < n && s.charAt(j) == ' ') j += 1
              word match {
                case "par" | "line" =>
                  if (!skip) { emit("\n"); nParas += 1 }
                case "tab" => emit("\t")
                case "uc" => uc = math.max(0, num.toInt)
                case "u" =>
                  if (!skip) {
                    val cp = ((num + 65536) % 65536).toInt
                    emit(cp.toChar.toString)
                    pendingSkip += uc
                  }
                case "ansicpg" =>
                  cs =
                    try Charset.forName("windows-" + num)
                    catch { case _: Exception => cp1252 }
                case w if SkipDests.contains(w) => skip = true
                case "bin" =>
                  // raw binary payload: skip exactly num bytes
                  if (num > 0) {
                    if (num > n - j) throw RtfFail
                    j += num.toInt
                  }
                case _ => () // formatting word: ignored
              }
              i = j
            }
          case _ =>
            if (pendingSkip > 0) pendingSkip -= 1
            else emit(c.toString)
            i += 1
        }
      }
      if (stack.nonEmpty) throw RtfFail
      // the \par count is paragraph BREAKS; text ends without one
      val t = out.toString
      val paras = 1 + t.count(_ == '\n')
      Some(RtfText(t, paras))
    } catch {
      case RtfFail => None
      case _: NumberFormatException => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  /** Real RTF fixture. mode 0: plain escapes, non-ASCII via `\uN?`;
    * mode 1: fonttbl/colortbl/stylesheet destinations + cp1252 bytes
    * as `\'hh` where representable; mode 2: starred-destination and
    * pict decoys, `\uc2` with two fallback chars, `\line` breaks.
    */
  def rtfWrite(text: String, mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val sb = new java.lang.StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0")
    if (m == 1)
      sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}}" +
        "{\\colortbl;\\red255\\green0\\blue0;}" +
        "{\\stylesheet{\\s0 Normal;}}")
    if (m == 2)
      sb.append("{\\*\\generator graft fixture 1.0;}" +
        "{\\pict\\wmetafile8 0102abcd}\\uc2 ")
    sb.append("\n")
    val enc1252 = cp1252.newEncoder()
    def appendChar(c: Char): Unit = c match {
      case '\\' => sb.append("\\\\")
      case '{' => sb.append("\\{")
      case '}' => sb.append("\\}")
      case '\t' => sb.append("\\tab ")
      case '\n' => sb.append(if (m == 2) "\\line " else "\\par\n")
      case c if c < 128 => sb.append(c)
      case c if m == 1 && enc1252.canEncode(c) =>
        val bytes = c.toString.getBytes(cp1252)
        sb.append(f"\\'${bytes(0) & 0xff}%02x")
      case c =>
        val v = if (c >= 0x8000) c.toInt - 65536 else c.toInt
        sb.append(s"\\u$v")
        sb.append(if (m == 2) "??" else "?")
    }
    text.foreach(appendChar)
    sb.append("}")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val rtfTextSchema: StructType = StructType(Seq(
    StructField("rtf_text", StringType),
    StructField("n_paras", IntegerType)))

  def decodeRtfText(bytes: Array[Byte]): Seq[Any] =
    rtfText(bytes) match {
      case Some(RtfText(t, p)) => Seq[Any](t, p)
      case None => Seq[Any](null, null)
    }

  /** Per-row RTF synthesizer (map-only). */
  def synthRtf(df: DataFrame, textCol: String, modeCol: String,
      outCol: String): DataFrame = {
    val (ti, mi) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ rtfWrite(text, r.getInt(mi)))
      }
    }(enc)
  }
}
