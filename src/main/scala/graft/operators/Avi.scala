package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** AVI container triage over a RIFF walk (the public OpenDML /
  * Microsoft AVI RIFF spec) — the third major crawl video
  * container next to MP4 ([[Multimodal]]) and Matroska ([[Mkv]]),
  * and the legacy format older corpora still carry.
  *
  * Walk: `RIFF…AVI ` → `LIST hdrl` → `avih` (frame timing, dims,
  * stream count) and per-stream `LIST strl` → `strh` (fccType,
  * handler, scale/rate/length) + `strf` (BITMAPINFOHEADER fourcc
  * for video, WAVEFORMATEX channels/rate for audio). The `movi`
  * payload LIST is skipped, never parsed — dims/codec tier only,
  * the same honest boundary as MP4 and Matroska.
  *
  * Duration comes from the VIDEO stream's strh scale/rate/length
  * when present (the authoritative clock) with the avih
  * frame-time × frame-count product as the fallback.
  *
  * Totality: None on damage; chunk sizes are bounds-checked and
  * odd sizes carry RIFF's pad byte. Scale: per-value, map-only.
  */
object Avi {

  private final case class AviFail() extends RuntimeException

  final case class AviMeta(durationMs: Double, width: Int,
      height: Int, nStreams: Int, videoCodec: String,
      audioChannels: Int, audioRate: Int)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def aviMeta(b: Array[Byte]): Option[AviMeta] = {
    if (b == null || b.length < 24) return None
    if (cc(b, 0) != "RIFF" || cc(b, 8) != "AVI ") return None
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4))
    try {
      var usPerFrame = 0L
      var totalFrames = 0L
      var width = -1
      var height = -1
      var nStreams = 0
      var vCodec: String = null
      var vScale = 0L
      var vRate = 0L
      var vLength = 0L
      var aCh = -1
      var aRate = -1

      /** Walk chunks in [from, until); LISTs recurse one level at
        * the caller's request.
        */
      def chunks(from: Long, until: Long)(
          f: (String, String, Long, Long) => Unit): Boolean = {
        var p = from
        while (p + 8 <= until) {
          val id = cc(b, p.toInt)
          val sz = le32(b, p.toInt + 4)
          val body = p + 8
          if (sz > until - body) return false
          val listType = if (id == "LIST" && sz >= 4)
            cc(b, body.toInt) else ""
          f(id, listType, body, body + sz)
          p = body + sz + (sz & 1) // RIFF pad to even
        }
        true
      }

      def parseStrl(from: Long, until: Long): Boolean = {
        var typ = ""
        var handler = ""
        var scale = 0L
        var rate = 0L
        var length = 0L
        val ok = chunks(from, until) { (id, _, f2, t2) =>
          id match {
            case "strh" if t2 - f2 >= 36 =>
              typ = cc(b, f2.toInt)
              handler = cc(b, f2.toInt + 4)
              scale = le32(b, f2.toInt + 20)
              rate = le32(b, f2.toInt + 24)
              length = le32(b, f2.toInt + 32)
            case "strf" if typ == "vids" && t2 - f2 >= 20 =>
              // BITMAPINFOHEADER: biCompression fourcc at +16
              val fcc = cc(b, f2.toInt + 16)
              if (vCodec == null)
                vCodec = if (le32(b, f2.toInt + 16) == 0) "raw"
                  else fcc
            case "strf" if typ == "auds" && t2 - f2 >= 8 =>
              if (aCh < 0) {
                aCh = le16(b, f2.toInt + 2)
                aRate = le32(b, f2.toInt + 4).toInt
              }
            case _ => ()
          }
        }
        if (!ok) return false
        nStreams += 1
        if (typ == "vids" && vScale == 0) {
          vScale = scale; vRate = rate; vLength = length
          if (vCodec == null && handler.trim.nonEmpty)
            vCodec = handler
        }
        true
      }

      var sawHdrl = false
      val ok = chunks(12L, riffEnd) { (id, lt, from, until) =>
        if (id == "LIST" && lt == "hdrl") {
          sawHdrl = true
          chunks(from + 4, until) { (id2, lt2, f2, t2) =>
            if (id2 == "avih" && t2 - f2 >= 40) {
              usPerFrame = le32(b, f2.toInt)
              totalFrames = le32(b, f2.toInt + 16)
              width = le32(b, f2.toInt + 32).toInt
              height = le32(b, f2.toInt + 36).toInt
            } else if (id2 == "LIST" && lt2 == "strl") {
              if (!parseStrl(f2 + 4, t2)) throw AviFail()
            }
          }
          ()
        } // movi / idx1 / JUNK: skipped
      }
      if (!ok || !sawHdrl || width <= 0 || height <= 0 ||
        nStreams == 0) return None
      val durMs =
        if (vRate > 0 && vLength > 0)
          vLength.toDouble * vScale * 1000.0 / vRate
        else if (usPerFrame > 0 && totalFrames > 0)
          totalFrames * usPerFrame / 1000.0
        else -1.0
      Some(AviMeta(durMs, width, height, nStreams,
        Option(vCodec).getOrElse(""), aCh, aRate))
    } catch {
      case _: AviFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (no AVI muxer exists in this environment — same
  // hand-built-from-spec precedent as the HEIF/Matroska fixtures)
  // ---------------------------------------------------------------

  def aviWrite(w: Int, h: Int, fps: Int, nFrames: Int,
      codec: String, audioChannels: Int, audioRate: Int)
      : Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bb.write(v & 0xff)
      bb.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => bb.write(c.toInt))
    def chunk(id: String)(body: => Unit): Unit = {
      val at = bb.size()
      tag(id); u32(0)
      body
      val raw = bb.toByteArray
      val size = raw.length - at - 8
      raw(at + 4) = (size & 0xff).toByte
      raw(at + 5) = ((size >> 8) & 0xff).toByte
      raw(at + 6) = ((size >> 16) & 0xff).toByte
      raw(at + 7) = ((size >> 24) & 0xff).toByte
      bb.reset(); bb.write(raw, 0, raw.length)
      if ((size & 1) == 1) bb.write(0) // RIFF pad
    }
    def list(lt: String)(body: => Unit): Unit =
      chunk("LIST") { tag(lt); body }
    chunk("RIFF") {
      tag("AVI ")
      list("hdrl") {
        chunk("avih") {
          u32(1000000L / fps); u32(0); u32(0); u32(0x10)
          u32(nFrames.toLong); u32(0); u32(2); u32(0)
          u32(w.toLong); u32(h.toLong); u32(0); u32(0); u32(0)
          u32(0)
        }
        list("strl") {
          chunk("strh") {
            tag("vids"); tag(codec); u32(0); u16(0); u16(0)
            u32(0); u32(1); u32(fps.toLong); u32(0)
            u32(nFrames.toLong); u32(0); u32(0); u32(0); u32(0)
          }
          chunk("strf") { // BITMAPINFOHEADER
            u32(40); u32(w.toLong); u32(h.toLong); u16(1); u16(24)
            tag(codec); u32(w.toLong * h * 3); u32(0); u32(0)
            u32(0); u32(0)
          }
        }
        list("strl") {
          chunk("strh") {
            tag("auds"); u32(1); u32(0); u16(0); u16(0)
            u32(0); u32(1); u32(audioRate.toLong); u32(0)
            u32(audioRate.toLong * nFrames / fps); u32(0); u32(0)
            u32(0); u32(0)
          }
          chunk("strf") { // WAVEFORMATEX (PCM)
            u16(1); u16(audioChannels); u32(audioRate.toLong)
            u32(audioRate.toLong * audioChannels * 2); u16(2)
            u16(16)
          }
        }
      }
      list("movi") {
        chunk("00dc") { tag("fake") } // payload tier: never parsed
        chunk("01wb") { u16(0); u16(0) }
      }
      chunk("idx1") { u32(0) }
    }
    bb.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val aviSchema: StructType = StructType(Seq(
    StructField("duration_ms", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_streams", IntegerType),
    StructField("video_codec", StringType),
    StructField("audio_channels", IntegerType),
    StructField("audio_rate", IntegerType)))

  def decodeAvi(bytes: Array[Byte]): Seq[Any] =
    aviMeta(bytes) match {
      case Some(m) => Seq[Any](m.durationMs, m.width, m.height,
        m.nStreams, m.videoCodec, m.audioChannels, m.audioRate)
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-row synth: planted dims/fps/frames, codec cycling. */
  def synthAvis(df: DataFrame, idCol: String, wCol: String,
      hCol: String, nCol: String, outCol: String): DataFrame = {
    val (ii, wi, hi, ni) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(wCol), df.schema.fieldIndex(hCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val codec = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => "MJPG"
          case 1 => "XVID"
          case _ => "H264"
        }
        val bytes = aviWrite(r.getInt(wi), r.getInt(hi),
          fps = 25, nFrames = r.getInt(ni), codec = codec,
          audioChannels = 2, audioRate = 44100)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
