package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Email text extraction — RFC 5322 messages (.eml) and mbox
  * archives — the mailing-list/newsgroup layer of a text corpus.
  * From-scratch MIME walk:
  *
  *   - header block parse with RFC 5322 folding (continuation lines
  *     unfold), case-insensitive names;
  *   - RFC 2047 encoded-words in Subject (`=?charset?B|Q?...?=`,
  *     including the adjacent-words-join rule);
  *   - `Content-Transfer-Encoding`: 7bit/8bit/binary pass-through,
  *     quoted-printable (soft breaks, `=HH`, trailing-WS rule),
  *     base64 (whitespace-tolerant);
  *   - `multipart` recursion by boundary (preamble/epilogue
  *     dropped, nested multiparts walked), collecting `text/plain`
  *     leaves in order; charset per part via the shared WHATWG label
  *     table ([[Http.charsetForLabel]]);
  *   - mbox: `From ` line splitting with `>From ` unstuffing.
  *
  * Total: malformed framing → None, never garbage or a throw.
  * Reference surface: pytrousse has no mail layer (beyond-parity,
  * like [[Docx]]/[[Rtf]]).
  */
object Mime {

  /** Decoded message: subject (RFC 2047-decoded), newline-joined
    * text/plain bodies, and the number of text parts collected.
    */
  final case class EmlText(subject: String, text: String, nParts: Int)

  private val MaxText = 64 << 20

  private object MimeFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------------------
  // transfer decodings
  // ------------------------------------------------------------------

  /** Quoted-printable per RFC 2045 §6.7: `=HH`, soft line breaks
    * `=CRLF`/`=LF`, other `=` sequences kept literally (crawl
    * tolerance); hard CRLF normalizes to LF.
    */
  private[graft] def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 2 < n && s.charAt(i + 1) == '\r' &&
          s.charAt(i + 2) == '\n') i += 3 // soft break
        else if (i + 1 < n && s.charAt(i + 1) == '\n') i += 2
        else if (i + 2 < n) {
          val h = Character.digit(s.charAt(i + 1), 16)
          val l = Character.digit(s.charAt(i + 2), 16)
          if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
          else { out.write('='); i += 1 }
        } else { out.write('='); i += 1 }
      } else if (c == '\r') { i += 1 } // CRLF -> LF via the \n branch
      else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  /** Whitespace-tolerant base64; None on any non-alphabet byte. */
  private[graft] def b64Decode(s: String): Option[Array[Byte]] = {
    val cleaned = s.filterNot(c => c == '\r' || c == '\n' ||
      c == ' ' || c == '\t')
    try Some(java.util.Base64.getDecoder.decode(cleaned))
    catch { case _: IllegalArgumentException => None }
  }

  private def charsetOf(label: String): Charset =
    Http.charsetForLabel(label).getOrElse(StandardCharsets.UTF_8)

  // ------------------------------------------------------------------
  // RFC 2047 encoded words (Subject etc.)
  // ------------------------------------------------------------------

  private val EncWord =
    "=\\?([^?]{1,40})\\?([BbQq])\\?([^?]{0,998})\\?=".r

  /** Decode RFC 2047 encoded-words; linear WS between two adjacent
    * encoded words is dropped per the spec, other text kept.
    */
  private[graft] def rfc2047(s: String): String = {
    val sb = new java.lang.StringBuilder
    var last = 0
    var prevEnd = -1 // end of the previous encoded word
    for (m <- EncWord.findAllMatchIn(s)) {
      val between = s.substring(last, m.start)
      // drop pure-whitespace gaps between adjacent encoded words
      if (!(prevEnd >= 0 && between.nonEmpty &&
        between.forall(c => c == ' ' || c == '\t')))
        sb.append(between)
      val cs = charsetOf(m.group(1))
      val payload = m.group(3)
      val bytes = m.group(2).toLowerCase match {
        case "b" => b64Decode(payload).getOrElse(Array.emptyByteArray)
        case _ => qpDecode(payload.replace('_', ' '))
      }
      sb.append(new String(bytes, cs))
      last = m.end
      prevEnd = m.end
    }
    sb.append(s.substring(last))
    sb.toString
  }

  // ------------------------------------------------------------------
  // header block
  // ------------------------------------------------------------------

  /** Unfold + parse one header block (already split from the body).
    * Names lower-cased; later duplicates kept in order.
    */
  private def parseHeaders(block: String): Seq[(String, String)] = {
    val unfolded = block.replace("\r\n", "\n")
      .replaceAll("\n[ \t]+", " ")
    unfolded.split("\n", -1).toSeq.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some((l.substring(0, c).trim
        .toLowerCase(java.util.Locale.ROOT), l.substring(c + 1).trim))
    }
  }

  private def header(hs: Seq[(String, String)], name: String)
      : Option[String] =
    hs.collectFirst { case (k, v) if k == name => v }

  /** `Content-Type` → (mime-lowercased, params-lowercased-keys).
    * Quoted parameter values unquoted.
    */
  private[graft] def contentType(v: String)
      : (String, Map[String, String]) = {
    val parts = v.split(";")
    val mime = parts(0).trim.toLowerCase(java.util.Locale.ROOT)
    val params = parts.drop(1).flatMap { p =>
      val e = p.indexOf('=')
      if (e <= 0) None
      else {
        val k = p.substring(0, e).trim
          .toLowerCase(java.util.Locale.ROOT)
        var value = p.substring(e + 1).trim
        if (value.length >= 2 && value.startsWith("\"") &&
          value.endsWith("\""))
          value = value.substring(1, value.length - 1)
        Some(k -> value)
      }
    }.toMap
    (mime, params)
  }

  // ------------------------------------------------------------------
  // message walk
  // ------------------------------------------------------------------

  /** Split a raw entity into (headerBlock, body). The blank line may
    * be CRLFCRLF or LFLF (mbox files are routinely LF-only).
    */
  private def splitEntity(s: String): (String, String) = {
    val crlf = s.indexOf("\r\n\r\n")
    val lf = s.indexOf("\n\n")
    if (crlf >= 0 && (lf < 0 || crlf + 1 <= lf))
      (s.substring(0, crlf), s.substring(crlf + 4))
    else if (lf >= 0) (s.substring(0, lf), s.substring(lf + 2))
    else (s, "")
  }

  /** Walk one MIME entity, appending decoded text/plain leaves. */
  private def walkEntity(s: String, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (depth > 8) throw MimeFail
    val (headBlock, body) = splitEntity(s)
    val hs = parseHeaders(headBlock)
    val (mime, params) = header(hs, "content-type")
      .map(contentType)
      .getOrElse(("text/plain", Map.empty[String, String]))
    if (mime.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", throw MimeFail)
      if (boundary.isEmpty || boundary.length > 200) throw MimeFail
      val delim = "--" + boundary
      // split on delimiter lines; part 0 is the preamble (dropped)
      val chunks = body.split(
        "(?m)^" + java.util.regex.Pattern.quote(delim) +
          "(--)?[ \t]*\r?\n?", -1)
      val alternative = mime == "multipart/alternative"
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      var i = 1
      while (i < chunks.length) {
        val part = chunks(i)
        // the epilogue follows the --boundary-- terminator; the
        // regex above consumed the terminator, so the LAST chunk is
        // epilogue only when a terminator was present
        if (i < chunks.length - 1 || !body.contains(delim + "--"))
          parts += stripTrailingCrlf(part)
        i += 1
      }
      if (alternative) {
        // RFC 2046 §5.1.4: alternatives order best-last — take the
        // LAST part that yields text, not every redundant rendering
        var picked = false
        for (part <- parts.reverseIterator if !picked) {
          val tmp = scala.collection.mutable.ArrayBuffer[String]()
          walkEntity(part, depth + 1, tmp)
          if (tmp.nonEmpty) { out ++= tmp; picked = true }
        }
      } else parts.foreach(walkEntity(_, depth + 1, out))
    } else if (mime == "text/plain") {
      val cte = header(hs, "content-transfer-encoding")
        .getOrElse("7bit").trim.toLowerCase(java.util.Locale.ROOT)
      val bytes: Array[Byte] = cte match {
        case "base64" =>
          b64Decode(body).getOrElse(throw MimeFail)
        case "quoted-printable" => qpDecode(body)
        case "7bit" | "8bit" | "binary" | "" =>
          body.getBytes(StandardCharsets.ISO_8859_1)
        case _ => throw MimeFail
      }
      val cs = charsetOf(params.getOrElse("charset", "utf-8"))
      val text = new String(bytes, cs).replace("\r\n", "\n")
      // line-oriented encodings (qp/7bit) end the body with a
      // canonical newline the writer added — strip exactly one;
      // base64 carries the exact bytes, a trailing LF there is
      // payload, not framing
      out += (if (cte == "base64") text else stripTrailingLf(text))
      if (out.map(_.length).sum > MaxText) throw MimeFail
    }
    // other leaf types (text/html, images, ...) are not text/plain
    // payload: skipped — the html path lives in the crawl operators
  }

  private def stripTrailingCrlf(s: String): String = {
    var e = s.length
    while (e > 0 && (s.charAt(e - 1) == '\n' || s.charAt(e - 1) == '\r'))
      e -= 1
    s.substring(0, e)
  }

  private def stripTrailingLf(s: String): String =
    if (s.endsWith("\n")) s.substring(0, s.length - 1) else s

  /** One .eml message → subject + joined text/plain parts. */
  def emlText(b: Array[Byte]): Option[EmlText] = {
    if (b == null || b.length < 8) return None
    try {
      val s = new String(b, StandardCharsets.ISO_8859_1)
      val (headBlock, _) = splitEntity(s)
      val hs = parseHeaders(headBlock)
      // a message must carry at least one structural header
      if (header(hs, "from").isEmpty && header(hs, "subject").isEmpty
        && header(hs, "content-type").isEmpty) return None
      val subject = rfc2047(header(hs, "subject").getOrElse(""))
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      walkEntity(s, 0, parts)
      Some(EmlText(subject, parts.mkString("\n"), parts.length))
    } catch {
      case MimeFail => None
      case _: StackOverflowError => None
    }
  }

  /** mbox bytes → one EmlText per message: split on `From ` lines
    * (message separator), un-stuff `>From ` at line starts.
    */
  def mboxMessages(b: Array[Byte]): Option[Seq[EmlText]] = {
    if (b == null || b.length < 6) return None
    val s = new String(b, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("From ")) return None
    val raw = s.split("(?m)^From [^\n]*\n", -1).drop(1)
    if (raw.isEmpty) return None
    val out = Seq.newBuilder[EmlText]
    for (msg <- raw) {
      val unstuffed = msg.replaceAll("(?m)^>From ", "From ")
      emlText(unstuffed.getBytes(StandardCharsets.ISO_8859_1)) match {
        case Some(m) => out += m
        case None => return None
      }
    }
    Some(out.result())
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private def qpEncode(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder
    var lineLen = 0
    for (b <- bytes) {
      val c = b & 0xff
      val tok =
        if (c == '\n') { lineLen = -1; "\n" }
        else if (c >= 33 && c <= 126 && c != '=') (c.toChar).toString
        else if (c == ' ' || c == '\t') (c.toChar).toString
        else f"=$c%02X"
      if (lineLen + tok.length > 72 && tok != "\n") {
        sb.append("=\n"); lineLen = 0
      }
      sb.append(tok)
      lineLen += tok.length
    }
    sb.toString
  }

  private def b64Encode(s: String): String =
    java.util.Base64.getMimeEncoder(60, "\n".getBytes)
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** Real .eml fixture: subject RFC 2047-encoded (B in modes 0/2,
    * Q in mode 1). mode 0: single-part quoted-printable; mode 1:
    * multipart/mixed with a base64 text/plain + an ignored text/html
    * sibling; mode 2: NESTED multipart/alternative inside
    * multipart/mixed with the plain leaf split across two parts.
    */
  def emlWrite(subject: String, text: String, mode: Int)
      : Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    // RFC 2047 Q form: space→'_'; '?', '_', '=' and non-printables
    // MUST be =HH (a bare '?' would terminate the encoded word)
    def q2047(s: String): String =
      s.getBytes(StandardCharsets.UTF_8).map { b =>
        val c = b & 0xff
        if (c == ' ') "_"
        else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || "!*+-/".indexOf(c) >= 0)
          c.toChar.toString
        else f"=$c%02X"
      }.mkString
    val encSubj =
      if (m == 1) "=?utf-8?Q?" + q2047(subject) + "?="
      else "=?utf-8?B?" + java.util.Base64.getEncoder
        .encodeToString(subject.getBytes(StandardCharsets.UTF_8)) +
        "?="
    val sb = new java.lang.StringBuilder
    sb.append("From: Fixture Writer <fixture@example.test>\n")
    sb.append("To: corpus@example.test\n")
    sb.append("Subject: ").append(encSubj).append("\n")
    sb.append("Date: Fri, 15 Aug 2025 12:00:00 +0000\n")
    m match {
      case 1 =>
        val b = "=_graft_1_="
        sb.append(s"""Content-Type: multipart/mixed; boundary="$b"""")
          .append("\n")
        sb.append("MIME-Version: 1.0\n\n")
        sb.append("preamble is always dropped\n")
        sb.append(s"--$b\n")
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: base64\n\n")
        sb.append(b64Encode(text)).append("\n")
        sb.append(s"--$b\n")
        sb.append("Content-Type: text/html; charset=utf-8\n\n")
        sb.append("<p>html sibling is not plain text</p>\n")
        sb.append(s"--$b--\n")
        sb.append("epilogue dropped too\n")
      case 2 =>
        // nested multipart/alternative: the SAME text twice (qp then
        // base64) — a correct reader takes only the LAST alternative
        val outer = "=_outer_="
        val inner = "=_inner_="
        sb.append(
          s"""Content-Type: multipart/mixed; boundary="$outer"""")
          .append("\nMIME-Version: 1.0\n\n")
        sb.append(s"--$outer\n")
        sb.append(
          s"""Content-Type: multipart/alternative; boundary="$inner"""")
          .append("\n\n")
        sb.append(s"--$inner\n")
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\n\n")
        sb.append(qpEncode(text)).append("\n")
        sb.append(s"--$inner\n")
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: base64\n\n")
        sb.append(b64Encode(text)).append("\n")
        sb.append(s"--$inner--\n")
        sb.append(s"--$outer\n")
        sb.append("Content-Type: application/octet-stream\n")
        sb.append("Content-Transfer-Encoding: base64\n\n")
        sb.append("AAECAwQ=\n")
        sb.append(s"--$outer--\n")
      case _ =>
        sb.append("Content-Type: text/plain; charset=utf-8\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\n")
        sb.append("MIME-Version: 1.0\n\n")
        sb.append(qpEncode(text)).append("\n")
    }
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** mbox fixture wrapping several messages. */
  def mboxWrite(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    for (m <- msgs) {
      sb.append("From fixture@example.test Fri Aug 15 12:00:00 2025\n")
      val body = new String(m, StandardCharsets.ISO_8859_1)
        .replaceAll("(?m)^From ", ">From ")
      sb.append(body)
      if (!body.endsWith("\n")) sb.append("\n")
    }
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val emlTextSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("eml_text", StringType),
    StructField("n_parts", IntegerType)))

  def decodeEmlText(bytes: Array[Byte]): Seq[Any] =
    emlText(bytes) match {
      case Some(EmlText(s, t, n)) => Seq[Any](s, t, n)
      case None => Seq[Any](null, null, null)
    }

  /** Per-row EML synthesizer (map-only). */
  def synthEml(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ti, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val subject = "Re: doc " + r.get(ii) + " résumé"
        Row.fromSeq(r.toSeq :+
          emlWrite(subject, text, r.getInt(mi)))
      }
    }(enc)
  }
}
