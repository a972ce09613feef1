package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PNG ancillary-chunk metadata — tEXt / zTXt / iTXt text, pHYs
  * density, tIME timestamps — the image-side caption/provenance
  * channel (alt-text-grade captions ride PNG text chunks in the
  * wild, and density/time are curation signals). Completes the image
  * metadata story next to the JPEG EXIF path ([[Exif]]).
  *
  * From the public PNG spec (RFC 2083 / W3C):
  *
  *  - Chunk walk: 8-byte signature, then length/type/data/CRC —
  *    every chunk's CRC-32 VERIFIED (type+data, the standard
  *    reflected polynomial) — a lying CRC refuses the file, never
  *    silently-corrupt metadata.
  *  - tEXt: `keyword NUL latin-1-text`; zTXt: `keyword NUL method
  *    NUL-means-deflate zlib-stream` (method must be 0); iTXt:
  *    `keyword NUL compFlag compMethod lang NUL translated NUL
  *    utf-8-text`, compressed when compFlag=1.
  *  - pHYs: pixels-per-unit x/y + unit flag; tIME: y/mo/d h:m:s.
  *  - Keywords must be 1–79 latin-1 chars per spec; violations
  *    refuse. IDAT/pixels are not touched here — pixel decode
  *    already lives in Multimodal (C139).
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object PngMeta {

  private object PngFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  /** Parsed metadata: (keyword, text) pairs in chunk order, pixels
    * per meter (x, y) when pHYs unit=1, tIME as an ISO-ish string.
    */
  final case class PngTexts(texts: Seq[(String, String)],
      ppmX: Option[Long], ppmY: Option[Long], time: String)

  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw PngFail
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private def latin1(b: Array[Byte], from: Int, until: Int)
      : String = {
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) { sb.append(((b(i) & 0xff)).toChar); i += 1 }
    sb.toString
  }

  private def inflateZlib(d: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater() // zlib-wrapped per spec
    try {
      inf.setInput(d)
      val out = new java.io.ByteArrayOutputStream(d.length * 2)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case _: java.util.zip.DataFormatException =>
              throw PngFail
          }
        if (n == 0 && inf.needsInput()) throw PngFail
        out.write(buf, 0, n)
        if (out.size() > MaxText) throw PngFail
      }
      out.toByteArray
    } finally inf.end()
  }

  private def nulAt(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i < until && b(i) != 0) i += 1
    if (i >= until) throw PngFail
    i
  }

  private def keyword(b: Array[Byte], from: Int, nul: Int)
      : String = {
    val n = nul - from
    if (n < 1 || n > 79) throw PngFail // spec: 1-79 chars
    latin1(b, from, nul)
  }

  /** Walk a PNG's chunks for text/density/time metadata. None on a
    * bad signature, a lying chunk CRC, or malformed chunk innards.
    */
  def pngTexts(b: Array[Byte]): Option[PngTexts] = {
    if (b == null || b.length < 8) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    for (i <- 0 until 8)
      if ((b(i) & 0xff) != sig(i)) return None
    try {
      val texts = scala.collection.mutable
        .ArrayBuffer[(String, String)]()
      var ppmX: Option[Long] = None
      var ppmY: Option[Long] = None
      var time = ""
      var total = 0L
      var p = 8
      var done = false
      while (!done && p + 12 <= b.length) {
        val len = u32(b, p)
        if (len > Int.MaxValue - 16 || p + 12 + len > b.length)
          throw PngFail
        val tpe = latin1(b, p + 4, p + 8)
        val from = p + 8
        val until = (from + len).toInt
        // CRC over type+data with the standard reflected CRC-32
        val crc = new java.util.zip.CRC32()
        crc.update(b, p + 4, (4 + len).toInt)
        if (crc.getValue != u32(b, until)) throw PngFail
        tpe match {
          case "tEXt" =>
            val nul = nulAt(b, from, until)
            texts += ((keyword(b, from, nul),
              latin1(b, nul + 1, until)))
          case "zTXt" =>
            val nul = nulAt(b, from, until)
            if (nul + 1 >= until || b(nul + 1) != 0) throw PngFail
            val text = new String(inflateZlib(
              java.util.Arrays.copyOfRange(b, nul + 2, until)),
              StandardCharsets.ISO_8859_1)
            texts += ((keyword(b, from, nul), text))
          case "iTXt" =>
            val nul = nulAt(b, from, until)
            if (nul + 2 >= until) throw PngFail
            val compFlag = b(nul + 1) & 0xff
            val compMethod = b(nul + 2) & 0xff
            if (compFlag > 1 || compMethod != 0) throw PngFail
            val langNul = nulAt(b, nul + 3, until)
            val transNul = nulAt(b, langNul + 1, until)
            val raw =
              java.util.Arrays.copyOfRange(b, transNul + 1, until)
            val text = new String(
              if (compFlag == 1) inflateZlib(raw) else raw,
              StandardCharsets.UTF_8)
            texts += ((keyword(b, from, nul), text))
          case "pHYs" =>
            if (len != 9) throw PngFail
            if ((b(from + 8) & 0xff) == 1) { // unit = meter
              ppmX = Some(u32(b, from))
              ppmY = Some(u32(b, from + 4))
            }
          case "tIME" =>
            if (len != 7) throw PngFail
            val y = ((b(from) & 0xff) << 8) | (b(from + 1) & 0xff)
            time = f"$y%04d-${b(from + 2) & 0xff}%02d-" +
              f"${b(from + 3) & 0xff}%02d " +
              f"${b(from + 4) & 0xff}%02d:${b(from + 5) & 0xff}%02d:" +
              f"${b(from + 6) & 0xff}%02d"
          case "IEND" => done = true
          case _ => ()
        }
        total += texts.map(_._2.length.toLong).sum
        if (total > MaxText) throw PngFail
        p = until + 4
      }
      Some(PngTexts(texts.toSeq, ppmX, ppmY, time))
    } catch {
      case PngFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    val len = data.length
    out(0) = ((len >> 24) & 0xff).toByte
    out(1) = ((len >> 16) & 0xff).toByte
    out(2) = ((len >> 8) & 0xff).toByte
    out(3) = (len & 0xff).toByte
    for (i <- 0 until 4) out(4 + i) = tpe.charAt(i).toByte
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 4, 4 + len)
    val c = crc.getValue
    out(8 + len) = ((c >> 24) & 0xff).toByte
    out(9 + len) = ((c >> 16) & 0xff).toByte
    out(10 + len) = ((c >> 8) & 0xff).toByte
    out(11 + len) = (c & 0xff).toByte
    out
  }

  private def deflateZlib(d: Array[Byte]): Array[Byte] = {
    val def0 = new java.util.zip.Deflater()
    def0.setInput(d); def0.finish()
    val buf = new Array[Byte](d.length + 64)
    val n = def0.deflate(buf)
    def0.end()
    java.util.Arrays.copyOf(buf, n)
  }

  /** Insert real metadata chunks after a PNG's IHDR: a latin-1 tEXt
    * `Title`, a deflated zTXt `Description`, a UTF-8 iTXt `Comment`
    * (compressed when `(ppm % 2) == 1`), pHYs, and tIME.
    */
  def pngWithMeta(png: Array[Byte], title: String, desc: String,
      comment: String, ppm: Long, time: (Int, Int, Int, Int, Int,
        Int)): Array[Byte] = {
    require(png.length > 33, "not a PNG")
    def latin1b(s: String): Array[Byte] = {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        out(i) = (if (c < 0x100) c else '?').toByte
        i += 1
      }
      out
    }
    val tEXt = chunk("tEXt",
      latin1b("Title") ++ Array[Byte](0) ++ latin1b(title))
    val zTXt = chunk("zTXt",
      latin1b("Description") ++ Array[Byte](0, 0) ++
        deflateZlib(latin1b(desc)))
    val cFlag = (ppm % 2).toInt
    val cBytes = comment.getBytes(StandardCharsets.UTF_8)
    val iTXt = chunk("iTXt",
      latin1b("Comment") ++ Array[Byte](0, cFlag.toByte, 0) ++
        latin1b("en") ++ Array[Byte](0) ++ Array[Byte](0) ++
        (if (cFlag == 1) deflateZlib(cBytes) else cBytes))
    val pHYs = chunk("pHYs", {
      val d = new Array[Byte](9)
      for ((v, o) <- Seq((ppm, 0), (ppm + 1, 4))) {
        d(o) = ((v >> 24) & 0xff).toByte
        d(o + 1) = ((v >> 16) & 0xff).toByte
        d(o + 2) = ((v >> 8) & 0xff).toByte
        d(o + 3) = (v & 0xff).toByte
      }
      d(8) = 1
      d
    })
    val tIME = chunk("tIME", {
      val (y, mo, dd, h, mi, s) = time
      Array[Byte](((y >> 8) & 0xff).toByte, (y & 0xff).toByte,
        mo.toByte, dd.toByte, h.toByte, mi.toByte, s.toByte)
    })
    // IHDR ends at offset 8 + 12 + 13 = 33
    val out = new java.io.ByteArrayOutputStream(
      png.length + 256 + title.length + desc.length)
    out.write(png, 0, 33)
    for (c <- Seq(tEXt, zTXt, iTXt, pHYs, tIME))
      out.write(c, 0, c.length)
    out.write(png, 33, png.length - 33)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val pngMetaSchema: StructType = StructType(Seq(
    StructField("png_text", StringType),
    StructField("n_texts", IntegerType),
    StructField("ppm_x", LongType),
    StructField("ppm_y", LongType),
    StructField("png_time", StringType)))

  /** Decode kernel: `keyword=text` pairs joined with newlines. */
  def decodePngMeta(bytes: Array[Byte]): Seq[Any] =
    pngTexts(bytes) match {
      case Some(PngTexts(ts, px, py, time)) =>
        Seq[Any](ts.map { case (k, v) => k + "=" + v }
          .mkString("\n"), ts.length,
          px.map(Long.box).orNull, py.map(Long.box).orNull, time)
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-row synthesizer (map-only): an 8×8 gray PNG carrying the
    * row's text as Title (first line) / Description (full) /
    * Comment (fixed non-latin-1, forcing real UTF-8 in iTXt),
    * id-derived density and timestamp.
    */
  def synthPngMeta(df: DataFrame, idCol: String, textCol: String,
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
        val firstLine = {
          val nl = text.indexOf('\n')
          if (nl < 0) text else text.substring(0, nl)
        }
        val pix = Array.tabulate(64)(i => ((i * 3 + id) % 256).toInt)
        val png = Multimodal.pngEncodeGray(8, 8, pix)
        val withMeta = pngWithMeta(png, firstLine, text,
          "caption Ω " + (id % 6), 2834 + (id % 100),
          (2026, 8, 15, (id % 24).toInt, (id % 60).toInt, 0))
        Row.fromSeq(r.toSeq :+ withMeta)
      }
    }(enc)
  }
}
