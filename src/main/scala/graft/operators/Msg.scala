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

  /** Decoded message: subject, plain-text body, sender display name
    * (empty when the property is absent).
    */
  final case class MsgDoc(subject: String, body: String,
      sender: String)

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
      Some(MsgDoc(prop("0037"), prop("1000"), prop("0C1A")))
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
      mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    def stream(pid: String, s: String, preferNarrow: Boolean)
        : (String, Array[Byte]) = {
      val narrow = preferNarrow && latin1able(s)
      val tpe = if (narrow) "001E" else "001F"
      (Prefix + pid + tpe, propBytes(s, narrow))
    }
    val narrowPref = m != 0
    val base = Seq(
      stream("0037", subject, narrowPref),
      stream("1000", body, narrowPref),
      stream("0C1A", sender, m == 1),
      // display-to: present in real messages, not extracted here
      stream("0E04", "corpus@example.test", narrowPref),
      ("__properties_version1.0", new Array[Byte](32 + 16 * 4)))
    val extra =
      if (m == 2) Seq(
        // message class + a binary property: never text
        stream("001A", "IPM.Note", true),
        (Prefix + "10090102",
          Array[Byte](0x1f, 0x2e, 0x3d, 0x4c)))
      else Seq.empty
    Cfb.cfbWrite(base ++ extra)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val msgSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("msg_body", StringType),
    StructField("sender", StringType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]. */
  def decodeMsg(bytes: Array[Byte]): Seq[Any] =
    msgText(bytes) match {
      case Some(MsgDoc(s, b, f)) => Seq[Any](s, b, f)
      case None => Seq[Any](null, null, null)
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
