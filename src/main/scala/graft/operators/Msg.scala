package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Outlook .msg text extraction over the MS-CFB walk
  * ([[Cfb.cfbStreams]]) — the enterprise-mail sibling of the
  * RFC 5322 path ([[Mime.emlText]]): exported Outlook messages on a
  * crawl are CFB containers, not RFC 822 text, and previously only
  * earned a container label.
  *
  * Per the public [MS-OXMSG] spec, every string property lives in its
  * own stream named `__substg1.0_PPPPTTTT` — PPPP the property id,
  * TTTT the type: 001F is UTF-16LE, 001E is the 8-bit code-page
  * form (both live in the wild; Outlook writes 001F, old exporters
  * 001E). Extracted properties:
  *
  *  - 0x0037 subject, 0x1000 body, 0x0C1A sender display name.
  *  - A 001F stream with odd length is structural damage → None for
  *    the whole document (never a silently truncated string).
  *  - A document with no `__substg1.0_` streams and no
  *    `__properties_version1.0` is not a .msg → None.
  *
  * The RTF-compressed body (0x1009) and nested attachment/recipient
  * storages are out of scope here: the CFB walk surfaces only
  * streams, and [MS-OXRTFCP] compression is a separate codec — the
  * honest-refusal rule says surface what we parse, label what we
  * don't.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only,
  * no shuffle.
  */
object Msg {

  private object MsgFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  /** Decoded message: subject, plain-text body, sender display name,
    * and the text recovered from the wrapped RTF body (each empty
    * when its property is absent or, for RTF, LZFu-compressed).
    */
  final case class MsgDoc(subject: String, body: String,
      sender: String, rtfBodyText: String)

  private val Prefix = "__substg1.0_"

  private def decodeProp(name: String, data: Array[Byte]): String = {
    val tpe = name.substring(name.length - 4)
      .toUpperCase(java.util.Locale.ROOT)
    tpe match {
      case "001F" =>
        if (data.length % 2 != 0) throw MsgFail
        if (data.length > MaxText) throw MsgFail
        new String(data, StandardCharsets.UTF_16LE)
      case "001E" =>
        if (data.length > MaxText) throw MsgFail
        val sb = new java.lang.StringBuilder(data.length)
        var i = 0
        while (i < data.length) {
          sb.append((data(i) & 0xff).toChar)
          i += 1
        }
        sb.toString
      case _ => throw MsgFail // non-string type under a string pid
    }
  }

  /** The PidTagRtfCompressed (0x1009) wrapper per [MS-OXRTFCP]:
    * 16-byte header — COMPSIZE, RAWSIZE, COMPTYPE, CRC (all u32le).
    * MELA (0x414c454d) is a raw passthrough of RAWSIZE bytes; LZFu
    * (0x75465a4c) goes through [[Lzfu.decode]] with the header CRC
    * verified over the token stream and the decoded length checked
    * against RAWSIZE — a stream that lies about either refuses.
    */
  private[graft] def rtfDecompressed(d: Array[Byte])
      : Option[Array[Byte]] = {
    if (d.length < 16) return None
    def le32(o: Int): Long =
      (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)
    val compSize = le32(0)
    val rawSize = le32(4)
    val compType = le32(8)
    // COMPSIZE counts from offset 4: 12 remaining header bytes +
    // the token stream. Trailing slack beyond 4+COMPSIZE is legal
    // in real property values; a COMPSIZE past the buffer is not.
    if (compSize < 12 || 4 + compSize > d.length) return None
    if (rawSize > MaxText) return None
    val end = (4 + compSize).toInt
    compType match {
      case 0x414c454dL => // MELA: uncompressed passthrough
        if (16 + rawSize > end) None
        else Some(java.util.Arrays.copyOfRange(d, 16,
          (16 + rawSize).toInt))
      case 0x75465a4cL =>
        if (Lzfu.crc(d, 16, end) != le32(12)) None
        else Lzfu.decode(d, 16, end, MaxText)
          .filter(_.length.toLong == rawSize)
      case _ => None
    }
  }

  /** Parse a .msg. None for non-CFB bytes, a container without the
    * .msg property streams, or structural damage.
    */
  def msgText(b: Array[Byte]): Option[MsgDoc] = {
    val doc = Cfb.cfbStreams(b).getOrElse(return None)
    val isMsg = doc.streams.exists(s =>
      s.name.startsWith(Prefix) ||
        s.name == "__properties_version1.0")
    if (!isMsg) return None
    try {
      def prop(pid: String): String =
        doc.streams.find(s => s.name.startsWith(Prefix + pid) &&
          s.name.length == Prefix.length + 8) match {
          case Some(s) => decodeProp(s.name, s.data)
          case None => ""
        }
      // 0x1009: wrapped RTF → plain text via the real RTF parser
      val rtf = doc.streams.find(_.name == Prefix + "10090102")
        .flatMap(s => rtfDecompressed(s.data))
        .flatMap(Rtf.rtfText)
        .map(_.text).getOrElse("")
      Some(MsgDoc(prop("0037"), prop("1000"), prop("0C1A"), rtf))
    } catch {
      case MsgFail => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private def latin1able(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x100) return false
      i += 1
    }
    true
  }

  private def propBytes(s: String, narrow: Boolean): Array[Byte] =
    if (!narrow) s.getBytes(StandardCharsets.UTF_16LE)
    else {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) { out(i) = s.charAt(i).toByte; i += 1 }
      out
    }

  /** A real .msg: subject/body/sender property streams plus a
    * `__properties_version1.0` decoy and an unextracted display-to
    * property. mode 0: all UTF-16LE (001F); mode 1: the 8-bit 001E
    * form wherever latin-1 fits (falling back per-field); mode 2:
    * mixed, with extra decoy properties.
    */
  def msgWrite(subject: String, body: String, sender: String,
      mode: Int,
      attachments: Seq[(String, Array[Byte])] = Seq.empty)
      : Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def stream(pid: String, s: String, preferNarrow: Boolean)
        : (String, Array[Byte]) = {
      val narrow = preferNarrow && latin1able(s)
      val tpe = if (narrow) "001E" else "001F"
      (Prefix + pid + tpe, propBytes(s, narrow))
    }
    val narrowPref = m != 0
    // the 0x1009 RTF body: the same text through the real RTF
    // writer; mode 1 wraps it LZFu-compressed (the form real
    // Outlook emits), the others MELA — the query cycle covers both
    val rtfWrapped = {
      val rtf = Rtf.rtfWrite(body, m)
      if (m == 1) Lzfu.compress(rtf)
      else {
        val out = new Array[Byte](16 + rtf.length)
        def le32(o: Int, v: Long): Unit = {
          out(o) = (v & 0xff).toByte
          out(o + 1) = ((v >> 8) & 0xff).toByte
          out(o + 2) = ((v >> 16) & 0xff).toByte
          out(o + 3) = ((v >> 24) & 0xff).toByte
        }
        le32(0, out.length - 4L) // COMPSIZE excludes its own field
        le32(4, rtf.length.toLong)
        le32(8, 0x414c454dL) // MELA
        le32(12, 0L) // CRC is 0 for uncompressed
        System.arraycopy(rtf, 0, out, 16, rtf.length)
        out
      }
    }
    val base = Seq(
      stream("0037", subject, narrowPref),
      stream("1000", body, narrowPref),
      stream("0C1A", sender, m == 1),
      // display-to: present in real messages, not extracted here
      stream("0E04", "corpus@example.test", narrowPref),
      (Prefix + "10090102", rtfWrapped),
      ("__properties_version1.0", new Array[Byte](32 + 16 * 4)))
    val extra =
      if (m == 2) Seq(
        // message class: metadata, never text
        stream("001A", "IPM.Note", true))
      else Seq.empty
    // attachment storages ([MS-OXMSG] 2.2.2): per attachment a
    // __attach_version1.0_#NNNNNNNN storage with the data bytes
    // (PidTagAttachDataBinary 3701, type 0102) and the long
    // filename (PidTagAttachLongFilename 3707)
    val attach = attachments.zipWithIndex.flatMap {
      case ((name, data), i) =>
        val st = f"__attach_version1.0_#$i%08X"
        Seq(
          (s"$st/__substg1.0_37010102", data),
          (s"$st/__substg1.0_3707001F",
            name.getBytes(StandardCharsets.UTF_16LE)))
    }
    Cfb.cfbWrite(base ++ extra ++ attach)
  }

  /** Attachment walk: every `__attach_version1.0_#…` storage's
    * data bytes + long filename, in storage order. Empty for
    * messages without attachments; None for non-msg bytes.
    */
  def msgAttachments(b: Array[Byte])
      : Option[Seq[(String, Array[Byte])]] = {
    val doc = Cfb.cfbStreams(b).getOrElse(return None)
    if (!doc.streams.exists(s => s.name.startsWith(Prefix) ||
      s.name == "__properties_version1.0")) return None
    val storages = doc.streams
      .filter(_.path.startsWith("__attach_version1.0_#"))
      .groupBy(_.path).toSeq.sortBy(_._1)
    Some(storages.flatMap { case (_, ss) =>
      val data = ss.find(_.name == "__substg1.0_37010102")
      val name = ss.find(_.name == "__substg1.0_3707001F")
        .map(s2 => new String(s2.data, StandardCharsets.UTF_16LE))
        .orElse(ss.find(_.name == "__substg1.0_3707001E")
          .map(s2 => new String(s2.data,
            StandardCharsets.ISO_8859_1)))
        .orElse(ss.find(_.name == "__substg1.0_3704001F")
          .map(s2 => new String(s2.data, StandardCharsets.UTF_16LE)))
      data.map(d => (name.getOrElse(""), d.data))
    })
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val msgSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("msg_body", StringType),
    StructField("sender", StringType),
    StructField("rtf_text", StringType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]. */
  def decodeMsg(bytes: Array[Byte]): Seq[Any] =
    msgText(bytes) match {
      case Some(MsgDoc(s, b, f, r)) => Seq[Any](s, b, f, r)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row synthesizer WITH attachments: same message layout
    * plus two attachments — `a0.txt` (plain text derived from the
    * body) and `a1.gz` (the body gzipped) — the nested-document
    * surface a curation run must unwrap.
    */
  def synthMsgAttach(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val attach = Seq(
          ("a0.txt", (s"a0:" + text).getBytes(StandardCharsets
            .UTF_8)),
          ("a1.gz", Archive.gzipWrite(
            (s"a1:" + text).getBytes(StandardCharsets.UTF_8),
            "a1")))
        Row.fromSeq(r.toSeq :+ msgWrite("msg " + (id % 100), text,
          "Fixture Sender Ω", (id % 3).toInt, attach))
      }
    }(enc)
  }

  /** One row per attachment: filename, sniffed format, size, and —
    * for gzip attachments — the INNER format after unwrapping (the
    * sniffDeep discipline applied inside mail).
    */
  def msgAttachRows(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("attach_name", StringType),
      StructField("label", StringType),
      StructField("u_size", LongType),
      StructField("inner_label", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        msgAttachments(r.getAs[Array[Byte]](ci)).toSeq.flatten.map {
          case (name, data) =>
            val label = Sniff.sniff(data)
            // u_size = the UNWRAPPED payload size (gzip members
            // report their decompressed length — the closed-form
            // quantity; compressed sizes are encoder-dependent)
            val (size, inner) =
              if (label == "application/gzip")
                Archive.gunzip(data) match {
                  case Some(g2) => (g2.length.toLong, Sniff.sniff(g2))
                  case None => (-1L, null)
                }
              else (data.length.toLong, null)
            Row(id, name, label, size, inner)
        }
      }
    }(enc)
  }

  /** Per-row .msg synthesizer (map-only): the row's text as the
    * body, id-derived subject, fixed non-latin-1 sender (forces the
    * 001F path even in narrow modes), layout rotating on doc_id%3.
    */
  def synthMsg(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        Row.fromSeq(r.toSeq :+ msgWrite("msg " + (id % 100), text,
          "Fixture Sender Ω", (id % 3).toInt))
      }
    }(enc)
  }
}
