package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Matroska/WebM container triage over an EBML walk (both formats
  * are publicly specified: RFC 8794 for EBML itself, the IETF
  * cellar Matroska drafts / matroska.org for the element ids) —
  * the third major crawl video container after MP4 and AVI, and
  * the one YouTube-era embeds ship as `.webm`.
  *
  * The walk parses VINT element ids (marker bit kept) and VINT
  * sizes (marker stripped; all-ones means unknown size, which real
  * streamed files use for Segment — handled by treating the rest
  * of the buffer as the element body). Surfaced: the EBML header's
  * DocType (webm vs matroska), Info's TimestampScale + Duration
  * (4- or 8-byte float) as milliseconds, and per-track CodecID /
  * PixelWidth / PixelHeight / SamplingFrequency / Channels for the
  * first video and first audio track. Clusters are never parsed —
  * this is the dims/codec tier, same honest boundary as MP4
  * ([[Multimodal]]): no pixel decode is claimed.
  *
  * Reference-probe note (recorded): no Matroska muxer exists in
  * this environment (no ffmpeg, mkvmerge, or GStreamer; libarchive
  * and libwebp do not write it), so fixtures are hand-built from
  * the public element tables — the same precedent as the HEIF
  * fixtures — with the decode logic cross-checked by the
  * unknown-size and float-width traps real files exercise.
  *
  * Totality: None on damage; depth/element bomb guards.
  * Scale: per-value, map-only.
  */
object Mkv {

  private val MaxElements = 100000

  final case class MkvMeta(docType: String, durationMs: Double,
      nTracks: Int, videoCodec: String, width: Int, height: Int,
      audioCodec: String, sampleRate: Double, channels: Int)

  // element ids (full-width, marker bit included)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdAudio = 0xe1L
  private val IdSamplingFrequency = 0xb5L
  private val IdChannels = 0x9fL

  private final case class Fail() extends RuntimeException

  /** VINT id: leading-zero count picks width, marker bit KEPT. */
  private def readId(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) throw Fail()
    val first = b(p) & 0xff
    val w =
      if ((first & 0x80) != 0) 1
      else if ((first & 0x40) != 0) 2
      else if ((first & 0x20) != 0) 3
      else if ((first & 0x10) != 0) 4
      else throw Fail()
    if (p + w > b.length) throw Fail()
    var v = 0L
    var i = 0
    while (i < w) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    (v, w)
  }

  /** VINT size: marker stripped; -1 for the all-ones unknown. */
  private def readSize(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) throw Fail()
    val first = b(p) & 0xff
    var w = 1
    var mask = 0x80
    while (mask != 0 && (first & mask) == 0) { w += 1; mask >>= 1 }
    if (mask == 0 || p + w > b.length) throw Fail()
    var v = (first & (mask - 1)).toLong
    var allOnes = (first & (mask - 1)) == mask - 1
    var i = 1
    while (i < w) {
      val x = b(p + i) & 0xff
      v = (v << 8) | x
      allOnes &&= x == 0xff
      i += 1
    }
    (if (allOnes) -1L else v, w)
  }

  private def uint(b: Array[Byte], from: Int, len: Int): Long = {
    if (len > 8) throw Fail()
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(from + i) & 0xff); i += 1 }
    v
  }

  private def fl(b: Array[Byte], from: Int, len: Int): Double =
    len match {
      case 4 => java.lang.Float.intBitsToFloat(
        uint(b, from, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, from, 8))
      case 0 => 0.0
      case _ => throw Fail()
    }

  /** Parse a Matroska/WebM file's metadata. None on damage or a
    * non-EBML payload.
    */
  def mkvMeta(b: Array[Byte]): Option[MkvMeta] = {
    if (b == null || b.length < 8) return None
    try {
      var docType: String = null
      var tsScale = 1000000L // default: 1 ms ticks
      var durTicks = -1.0
      var nTracks = 0
      var vCodec: String = null
      var vw = -1
      var vh = -1
      var aCodec: String = null
      var aRate = -1.0
      var aCh = -1
      var count = 0

      def children(from: Int, until: Int)(
          f: (Long, Int, Int) => Unit): Unit = {
        var p = from
        while (p < until) {
          count += 1
          if (count > MaxElements) throw Fail()
          val (id, iw) = readId(b, p)
          val (sz, sw) = readSize(b, p + iw)
          val body = p + iw + sw
          val end =
            if (sz < 0) until // unknown size: rest of the parent
            else body + sz
          if (sz >= 0 && (sz > until - body)) throw Fail()
          f(id, body, end.toInt)
          p = end.toInt
        }
      }

      def trackEntry(from: Int, until: Int): Unit = {
        var typ = -1L
        var codec: String = null
        var w = -1; var h = -1
        var rate = -1.0; var ch = -1
        children(from, until) { (id, f2, t2) =>
          id match {
            case IdTrackType => typ = uint(b, f2, t2 - f2)
            case IdCodecId => codec = new String(b, f2, t2 - f2,
              java.nio.charset.StandardCharsets.US_ASCII)
            case IdVideo => children(f2, t2) { (id2, f3, t3) =>
              id2 match {
                case IdPixelWidth => w = uint(b, f3, t3 - f3).toInt
                case IdPixelHeight => h = uint(b, f3, t3 - f3).toInt
                case _ => ()
              }
            }
            case IdAudio => children(f2, t2) { (id2, f3, t3) =>
              id2 match {
                case IdSamplingFrequency => rate = fl(b, f3, t3 - f3)
                case IdChannels => ch = uint(b, f3, t3 - f3).toInt
                case _ => ()
              }
            }
            case _ => ()
          }
        }
        nTracks += 1
        if (typ == 1 && vCodec == null) {
          vCodec = codec; vw = w; vh = h
        } else if (typ == 2 && aCodec == null) {
          aCodec = codec; aRate = rate; aCh = ch
        }
      }

      children(0, b.length) { (id, from, until) =>
        id match {
          case IdEbml => children(from, until) { (id2, f2, t2) =>
            if (id2 == IdDocType)
              docType = new String(b, f2, t2 - f2,
                java.nio.charset.StandardCharsets.US_ASCII)
          }
          case IdSegment => children(from, until) { (id2, f2, t2) =>
            id2 match {
              case IdInfo => children(f2, t2) { (id3, f3, t3) =>
                id3 match {
                  case IdTimestampScale =>
                    tsScale = uint(b, f3, t3 - f3)
                  case IdDuration => durTicks = fl(b, f3, t3 - f3)
                  case _ => ()
                }
              }
              case IdTracks => children(f2, t2) { (id3, f3, t3) =>
                if (id3 == IdTrackEntry) trackEntry(f3, t3)
              }
              case _ => () // clusters, cues, seek heads: skipped
            }
          }
          case _ => ()
        }
      }
      if (docType != "webm" && docType != "matroska") return None
      if (nTracks == 0) return None
      val durMs =
        if (durTicks < 0 || tsScale <= 0) -1.0
        else durTicks * tsScale / 1e6
      Some(MkvMeta(docType, durMs, nTracks,
        Option(vCodec).getOrElse(""), vw, vh,
        Option(aCodec).getOrElse(""), aRate, aCh))
    } catch {
      case _: Fail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixtures + synth; element tables from the public spec)
  // ---------------------------------------------------------------

  private def vintSize(v: Long): Array[Byte] = {
    // smallest width that holds v with the marker bit
    var w = 1
    while (w <= 8 && v >= (1L << (7 * w)) - 1) w += 1
    val out = new Array[Byte](w)
    var i = w - 1
    var x = v
    while (i >= 0) {
      out(i) = (x & 0xff).toByte
      x >>= 8
      i -= 1
    }
    out(0) = (out(0) | (0x80 >> (w - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val w = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    val out = new Array[Byte](w)
    var i = w - 1
    var x = id
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def elem(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(body.length.toLong) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && v >= (1L << (8 * w))) w += 1
    val out = new Array[Byte](w)
    var i = w - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def floatBody(v: Double, wide: Boolean): Array[Byte] =
    if (wide) {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
        .toArray
    } else {
      val bits = java.lang.Float.floatToIntBits(v.toFloat)
      (0 until 4).map(i => ((bits >> (8 * (3 - i))) & 0xff).toByte)
        .toArray
    }

  /** Write a minimal-but-honest mkv/webm: EBML header, Segment
    * (unknown size when `streamed`), Info with scale+duration,
    * Tracks with one video and one audio entry, one empty-ish
    * Cluster so the walk proves it skips payload.
    */
  def mkvWrite(webm: Boolean, durationMs: Double, w: Int, h: Int,
      sampleRate: Double, channels: Int, streamed: Boolean,
      wideFloat: Boolean): Array[Byte] = {
    val header = elem(IdEbml,
      elem(0x4286L, uintBody(1)) ++ // EBMLVersion
        elem(0x42f7L, uintBody(1)) ++ // EBMLReadVersion
        elem(0x42f2L, uintBody(4)) ++ // EBMLMaxIDLength
        elem(0x42f3L, uintBody(8)) ++ // EBMLMaxSizeLength
        elem(IdDocType, (if (webm) "webm" else "matroska")
          .getBytes("US-ASCII")) ++
        elem(0x4287L, uintBody(4)) ++ // DocTypeVersion
        elem(0x4285L, uintBody(2))) // DocTypeReadVersion
    val info = elem(IdInfo,
      elem(IdTimestampScale, uintBody(1000000L)) ++
        elem(IdDuration, floatBody(durationMs, wideFloat)))
    val video = elem(IdTrackEntry,
      elem(0xd7L, uintBody(1)) ++ // TrackNumber
        elem(0x73c5L, uintBody(1)) ++ // TrackUID
        elem(IdTrackType, uintBody(1)) ++
        elem(IdCodecId, (if (webm) "V_VP9" else "V_MPEG4/ISO/AVC")
          .getBytes("US-ASCII")) ++
        elem(IdVideo, elem(IdPixelWidth, uintBody(w.toLong)) ++
          elem(IdPixelHeight, uintBody(h.toLong))))
    val audio = elem(IdTrackEntry,
      elem(0xd7L, uintBody(2)) ++
        elem(0x73c5L, uintBody(2)) ++
        elem(IdTrackType, uintBody(2)) ++
        elem(IdCodecId, (if (webm) "A_OPUS" else "A_AAC")
          .getBytes("US-ASCII")) ++
        elem(IdAudio,
          elem(IdSamplingFrequency, floatBody(sampleRate, wide =
            false)) ++
            elem(IdChannels, uintBody(channels.toLong))))
    val tracks = elem(IdTracks, video ++ audio)
    val cluster = elem(0x1f43b672L, // Cluster with a Timestamp
      elem(0xe7L, uintBody(0)))
    val segBody = info ++ tracks ++ cluster
    val segment =
      if (streamed) // unknown-size VINT (1-byte all-ones)
        idBytes(IdSegment) ++ Array(0xffL.toByte) ++ segBody
      else elem(IdSegment, segBody)
    header ++ segment
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val mkvSchema: StructType = StructType(Seq(
    StructField("doc_type", StringType),
    StructField("duration_ms", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("video_codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("audio_codec", StringType),
    StructField("sample_rate", DoubleType),
    StructField("channels", IntegerType)))

  def decodeMkv(bytes: Array[Byte]): Seq[Any] =
    mkvMeta(bytes) match {
      case Some(m) => Seq[Any](m.docType, m.durationMs, m.nTracks,
        m.videoCodec, m.width, m.height, m.audioCodec, m.sampleRate,
        m.channels)
      case None => Seq[Any](null, null, null, null, null, null,
        null, null, null)
    }

  /** Per-row synth: planted dims/duration, webm/matroska and the
    * streamed/sized + float-width variants cycling by id.
    */
  def synthMkvs(df: DataFrame, idCol: String, wCol: String,
      hCol: String, durCol: String, outCol: String): DataFrame = {
    val (ii, wi, hi, di) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(wCol), df.schema.fieldIndex(hCol),
      df.schema.fieldIndex(durCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val m = java.lang.Math.floorMod(id, 4L).toInt
        val bytes = mkvWrite(webm = m % 2 == 0,
          durationMs = r.getInt(di).toDouble,
          w = r.getInt(wi), h = r.getInt(hi),
          sampleRate = 48000.0, channels = 2,
          streamed = m >= 2, wideFloat = m % 2 == 1)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
