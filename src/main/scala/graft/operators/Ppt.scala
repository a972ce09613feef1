package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Legacy PowerPoint 97+ (.ppt) text extraction over the MS-CFB walk
  * ([[Cfb.cfbStreams]]) — completes the legacy-Office trio
  * (.doc Cfb.scala:383, .xls Xls.scala:219).
  *
  * The reference repo has no presentation ingestion at all (its only
  * reader is CSV, `/root/reference/src/trousse/dataset.py:341`); a
  * crawl corpus carries decades of .ppt decks that previously only
  * earned an `application/vnd.ms-powerpoint` label (Cfb.scala:189).
  * This walks the `PowerPoint Document` stream's record tree for
  * real, per [MS-PPT]:
  *
  *  - Every record is an 8-byte header (recVer/recInstance u16,
  *    recType u16, recLen u32); containers are recVer == 0xF and
  *    nest — the walk recurses with strict bounds, so a recLen that
  *    overruns its parent refuses rather than reads garbage.
  *  - Text lives in TextCharsAtom (0x0FA0, UTF-16LE) and
  *    TextBytesAtom (0x0FA8, one byte per char, high byte zero),
  *    collected in stream order; PPT's paragraph separator `\r` and
  *    U+000B soft break both normalize to `\n`.
  *  - Slide census via SlideContainer (0x03EE) occurrences.
  *  - Encryption refuses honestly twice over: a `Current User`
  *    stream whose CurrentUserAtom carries the encrypted headerToken
  *    (0xF3D1C4DF instead of 0xE391C05F), or a
  *    CryptSession10Container (0x2F14) in the document stream.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only,
  * no shuffle, no driver loops; at 100 TB it scales with input bytes
  * like the other codecs.
  */
object Ppt {

  private object PptFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  private def le16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw PptFail
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def le32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw PptFail
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  // record types ([MS-PPT] 2.13.24)
  private val RtDocument = 0x03e8
  private val RtSlide = 0x03ee
  private val RtSlidePersistAtom = 0x03f3
  private val RtSlideListWithText = 0x0ff0
  private val RtTextHeaderAtom = 0x0f9f
  private val RtTextCharsAtom = 0x0fa0
  private val RtTextBytesAtom = 0x0fa8
  private val RtCurrentUserAtom = 0x0ff6
  private val RtCryptSession10 = 0x2f14

  private val TokenPlain = 0xe391c05fL
  private val TokenEncrypted = 0xf3d1c4dfL

  /** Decoded deck: text atoms joined in stream order (one `\n`
    * between atoms), slide-container count, text-atom count.
    */
  final case class PptDoc(text: String, nSlides: Int, nTextAtoms: Int)

  /** PPT wire text → reader text: `\r` paragraph marks and `\u000B`
    * soft breaks both become `\n`.
    */
  private def unwire(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out.append(if (c == '\r' || c == '\u000B') '\n' else c)
      i += 1
    }
    out.toString
  }

  /** Walk a .ppt to its text. None for non-CFB bytes, a missing
    * `PowerPoint Document` stream, encryption, or structural damage.
    */
  def pptText(b: Array[Byte]): Option[PptDoc] = {
    val doc = Cfb.cfbStreams(b).getOrElse(return None)
    val ppt = doc.streams.find(_.name == "PowerPoint Document")
      .map(_.data).getOrElse(return None)
    try {
      // encrypted decks announce themselves in the Current User atom
      doc.streams.find(_.name == "Current User").foreach { cu =>
        val d = cu.data
        if (d.length >= 16 && le16(d, 2) == RtCurrentUserAtom) {
          val token = le32(d, 12)
          if (token == TokenEncrypted) throw PptFail
          if (token != TokenPlain) throw PptFail
        }
      }
      val atoms = scala.collection.mutable.ArrayBuffer[String]()
      var nSlides = 0
      var totalText = 0L
      // depth-bounded recursive record walk over [from, to)
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 32) throw PptFail
        var p = from
        while (p + 8 <= to) {
          val verInst = le16(ppt, p)
          val recType = le16(ppt, p + 2)
          val len = le32(ppt, p + 4)
          val body = p + 8
          if (len < 0 || body + len > to) throw PptFail
          val end = (body + len).toInt
          if (recType == RtCryptSession10) throw PptFail
          if ((verInst & 0xf) == 0xf) { // container: recurse
            if (recType == RtSlide) nSlides += 1
            walk(body, end, depth + 1)
          } else recType match {
            case RtTextCharsAtom =>
              if (len % 2 != 0) throw PptFail
              val t = new String(ppt, body, len.toInt,
                StandardCharsets.UTF_16LE)
              totalText += t.length
              if (totalText > MaxText) throw PptFail
              atoms += unwire(t)
            case RtTextBytesAtom =>
              val sb = new java.lang.StringBuilder(len.toInt)
              var k = 0
              while (k < len) {
                sb.append((ppt(body + k) & 0xff).toChar)
                k += 1
              }
              totalText += len
              if (totalText > MaxText) throw PptFail
              atoms += unwire(sb.toString)
            case _ => ()
          }
          p = end
        }
        if (p != to) throw PptFail // trailing partial header
      }
      walk(0, ppt.length, 0)
      Some(PptDoc(atoms.mkString("\n"), nSlides, atoms.length))
    } catch {
      case PptFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer: a real multi-slide deck
  // ------------------------------------------------------------------

  private def hdr(verInst: Int, recType: Int, len: Int)
      : Array[Byte] = {
    val b = new Array[Byte](8)
    b(0) = (verInst & 0xff).toByte
    b(1) = ((verInst >> 8) & 0xff).toByte
    b(2) = (recType & 0xff).toByte
    b(3) = ((recType >> 8) & 0xff).toByte
    b(4) = (len & 0xff).toByte
    b(5) = ((len >> 8) & 0xff).toByte
    b(6) = ((len >> 16) & 0xff).toByte
    b(7) = ((len >> 24) & 0xff).toByte
    b
  }
  private def atom(recType: Int, body: Array[Byte],
      inst: Int = 0): Array[Byte] =
    hdr(inst << 4, recType, body.length) ++ body
  private def container(recType: Int, kids: Array[Byte],
      inst: Int = 0): Array[Byte] =
    hdr(0xf | (inst << 4), recType, kids.length) ++ kids

  private def latin1able(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x100) return false
      i += 1
    }
    true
  }

  /** Reader text → PPT wire text (`\n` → `\r` paragraph marks). */
  private def wire(s: String): String = s.replace('\n', '\r')

  /** One slide's worth of text records: TextHeaderAtom + the
    * narrowest honest text atom (bytes when latin-1 fits, UTF-16LE
    * chars otherwise; an empty slide is an empty bytes atom).
    */
  private def textRecords(s: String): Array[Byte] = {
    val th = atom(RtTextHeaderAtom, {
      val b = new Array[Byte](4)
      b(0) = 1 // Tx_TYPE_BODY
      b
    })
    val w = wire(s)
    val t =
      if (latin1able(w)) {
        val bytes = new Array[Byte](w.length)
        var i = 0
        while (i < w.length) { bytes(i) = w.charAt(i).toByte; i += 1 }
        atom(RtTextBytesAtom, bytes)
      } else atom(RtTextCharsAtom,
        w.getBytes(StandardCharsets.UTF_16LE))
    th ++ t
  }

  /** A real .ppt, one entry per slide: the document's
    * SlideListWithText carries the text (SlidePersistAtom +
    * TextHeaderAtom + text atom per slide — where PowerPoint itself
    * puts it for fast access), and one Slide container per entry
    * gives the slide census. Each slide independently picks the
    * bytes- or chars-atom encoding; `Current User` carries the
    * plaintext headerToken.
    */
  def pptWrite(pieces: Seq[String]): Array[Byte] = {
    require(pieces.nonEmpty, "a deck needs at least one slide")

    def persist(slideId: Int): Array[Byte] =
      atom(RtSlidePersistAtom, {
        val b = new Array[Byte](20)
        p32b(b, 0, slideId.toLong) // persistIdRef
        p32b(b, 8, 1L) // cTexts
        p32b(b, 12, 0x100L + slideId) // slideId
        b
      })
    val slwt = container(RtSlideListWithText,
      pieces.zipWithIndex.map { case (s, i) =>
        persist(i + 1) ++ textRecords(s)
      }.reduce(_ ++ _))
    val document = container(RtDocument, slwt)
    val slides = pieces.indices.map { _ =>
      container(RtSlide, atom(0x03ef, new Array[Byte](24))) // SlideAtom
    }.reduce(_ ++ _)
    val stream = document ++ slides

    val cu = {
      val name = "graft".getBytes(StandardCharsets.US_ASCII)
      val b = new Array[Byte](24 + name.length)
      p32b(b, 0, 0x14L) // size
      p32b(b, 4, TokenPlain)
      p32b(b, 8, 0L) // offsetToCurrentEdit
      b(12) = name.length.toByte; b(13) = 0
      b(14) = (0x03f4 & 0xff).toByte; b(15) = 0x03 // docFileVersion
      b(16) = 0x03; b(17) = 0x00 // major/minor
      System.arraycopy(name, 0, b, 20, name.length)
      b
    }
    Cfb.cfbWrite(Seq(
      ("Current User", atom(RtCurrentUserAtom, cu)),
      ("PowerPoint Document", stream)))
  }

  private def p32b(a: Array[Byte], o: Int, v: Long): Unit = {
    a(o) = (v & 0xff).toByte
    a(o + 1) = ((v >> 8) & 0xff).toByte
    a(o + 2) = ((v >> 16) & 0xff).toByte
    a(o + 3) = ((v >> 24) & 0xff).toByte
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val pptSchema: StructType = StructType(Seq(
    StructField("ppt_text", StringType),
    StructField("n_slides", IntegerType),
    StructField("n_text_atoms", IntegerType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]. */
  def decodePpt(bytes: Array[Byte]): Seq[Any] =
    pptText(bytes) match {
      case Some(PptDoc(t, nS, nA)) => Seq[Any](t, nS, nA)
      case None => Seq[Any](null, null, null)
    }

  /** Per-row .ppt synthesizer (map-only): the row's text on slide 1
    * (bytes-atom path for latin-1 text) and a fixed non-latin-1
    * closer on slide 2 that forces the UTF-16LE chars-atom path —
    * every deck exercises both text encodings.
    */
  def synthPpt(df: DataFrame, textCol: String, outCol: String)
      : DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ pptWrite(Seq(text, "fin Ω")))
      }
    }(enc)
  }
}
