package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ICO/CUR favicon triage (C247) — a crawler fetches a favicon for
  * every host it touches, so captures fill up with .ico blobs. The
  * layout is public (the Windows ICONDIR format): a 6-byte header
  * (reserved 0, type 1 icon / 2 cursor, count), then 16-byte
  * directory entries — width/height (0 means 256), color count,
  * planes/hotspot, bits-per-pixel, payload size and offset. Each
  * payload is either a BMP fragment (BITMAPINFOHEADER with DOUBLED
  * height for the AND mask) or a whole PNG, which modern icons
  * embed and which rides the existing PNG parser (C? Multimodal).
  *
  * Surfaced: icon-vs-cursor, entry count, per-file max dimensions,
  * PNG-embedded entry count, distinct bpp census, and a
  * bounds-validated payload check — an entry whose span lies
  * outside the file refuses the blob.
  *
  * Totality: None on damage. Scale: per-value map-only.
  */
object Ico {

  private val MaxEntries = 1024

  final case class IcoMeta(isCursor: Boolean, nEntries: Int,
      maxWidth: Int, maxHeight: Int, nPng: Int, bpps: Seq[Int])

  private def u16(b: Array[Byte], o: Int): Int = {
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }

  private def u32(b: Array[Byte], o: Int): Long = {
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** Parse one .ico/.cur. None on damage. */
  def icoMeta(b: Array[Byte]): Option[IcoMeta] = {
    if (b == null || b.length < 22) return None
    try {
      if (u16(b, 0) != 0) return None
      val typ = u16(b, 2)
      if (typ != 1 && typ != 2) return None
      val n = u16(b, 4)
      if (n == 0 || n > MaxEntries) return None
      if (b.length < 6 + 16 * n) return None
      var maxW = 0
      var maxH = 0
      var nPng = 0
      val bpps = scala.collection.mutable.SortedSet[Int]()
      var i = 0
      while (i < n) {
        val e = 6 + 16 * i
        var w = b(e) & 0xff
        var h = b(e + 1) & 0xff
        if (w == 0) w = 256
        if (h == 0) h = 256
        val size = u32(b, e + 8)
        val off = u32(b, e + 12)
        if (size < 8 || off < 6 + 16 * n ||
          off + size > b.length) return None
        val p = off.toInt
        val isPng = (b(p) & 0xff) == 0x89 && b(p + 1) == 'P' &&
          b(p + 2) == 'N' && b(p + 3) == 'G'
        if (isPng) {
          nPng += 1
          // the embedded PNG's true dims override the entry bytes
          val png = java.util.Arrays.copyOfRange(b, p,
            (off + size).toInt)
          Multimodal.pngDims(png) match {
            case Some(d) =>
              w = d.width
              h = d.height
              bpps += 32
            case None => return None
          }
        } else {
          // BITMAPINFOHEADER: biSize, width, DOUBLED height, bpp
          if (u32(b, p) != 40L) return None
          val bpp = u16(b, p + 14)
          if (bpp == 0 || bpp > 32) return None
          bpps += bpp
        }
        if (w > maxW) maxW = w
        if (h > maxH) maxH = h
        i += 1
      }
      Some(IcoMeta(typ == 2, n, maxW, maxH, nPng, bpps.toSeq))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  /** An icon whose entries are (dim, bpp, asPng) — square sizes,
    * BMP entries carry a minimal doubled-height header.
    */
  def icoWrite(cursor: Boolean, entries: Seq[(Int, Int, Boolean)])
      : Array[Byte] = {
    val payloads = entries.map { case (dim, bpp, asPng) =>
      if (asPng)
        Multimodal.pngEncodeGray(dim, dim,
          Array.tabulate(dim * dim)(j => (j * 7) % 256))
      else {
        val out = new java.io.ByteArrayOutputStream()
        def le32(v: Long): Unit = {
          var j = 0
          while (j < 4) {
            out.write(((v >> (8 * j)) & 0xff).toInt); j += 1
          }
        }
        le32(40L)
        le32(dim.toLong); le32(2L * dim) // doubled height
        out.write(1); out.write(0) // planes
        out.write(bpp & 0xff); out.write((bpp >> 8) & 0xff)
        le32(0L); le32(0L); le32(0L); le32(0L); le32(0L); le32(0L)
        // a token pixel block
        (0 until 8).foreach(_ => out.write(0x5a))
        out.toByteArray
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    def w32(v: Long): Unit = {
      var j = 0
      while (j < 4) { out.write(((v >> (8 * j)) & 0xff).toInt); j += 1 }
    }
    w16(0); w16(if (cursor) 2 else 1); w16(entries.length)
    var off = 6L + 16L * entries.length
    entries.zip(payloads).foreach { case ((dim, bpp, _), payload) =>
      out.write(if (dim >= 256) 0 else dim)
      out.write(if (dim >= 256) 0 else dim)
      out.write(0); out.write(0) // colors, reserved
      w16(1); w16(bpp)
      w32(payload.length.toLong)
      w32(off)
      off += payload.length
    }
    payloads.foreach(out.write)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val icoSchema: StructType = StructType(Seq(
    StructField("is_cursor", BooleanType),
    StructField("n_entries", IntegerType),
    StructField("max_width", IntegerType),
    StructField("max_height", IntegerType),
    StructField("n_png", IntegerType),
    StructField("bpps", StringType)))

  def decodeIco(bytes: Array[Byte]): Seq[Any] =
    icoMeta(bytes) match {
      case Some(m) => Seq[Any](m.isCursor, m.nEntries, m.maxWidth,
        m.maxHeight, m.nPng, m.bpps.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-doc synth: n sizes, a PNG entry on every even doc, a
    * cursor every fifth.
    */
  def synthIcos(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val n = (id % 3 + 1).toInt
        val entries = (0 until n).map { j =>
          (16 << j, if (j == 0) 4 else 24, false)
        } ++ (if (id % 2 == 0) Seq((48, 32, true)) else Seq.empty)
        val bytes = icoWrite(cursor = id % 5 == 0, entries)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
