package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Font triage (the public OpenType/sfnt, WOFF 1 and WOFF2 specs —
  * web crawls are full of font binaries, and the curation decision
  * wants family/style/shape facts without a rasterizer): the sfnt
  * table directory (TrueType 0x00010000 and CFF `OTTO` flavors),
  * the `name` table with Windows UTF-16BE records preferred over
  * Mac Roman, `head` (magic-checked units-per-em) and `maxp`
  * (glyph count); the WOFF container (per-table zlib) and the
  * WOFF2 container (table directory with flag-coded known tags +
  * varint lengths, the whole-blob brotli layer riding the in-repo
  * RFC 7932 decoder — `name`/`head`/`maxp` are never transformed,
  * so triage works without reconstructing transformed glyf).
  *
  * Pinning: the committed fixture is the SYSTEM DejaVu Serif
  * (a real-world 20-table TrueType under its free license),
  * asserted against fc-scan's recorded family/style/format facts;
  * the in-repo minimal writer round-trips planted values through
  * all three containers, with WOFF2's brotli layer exercising the
  * reference-pinned codec.
  *
  * Totality: None on damage; bounds everywhere. Scale: per-value,
  * map-only.
  */
object Font {

  private val MaxTables = 4096

  final case class FontMeta(container: String, flavor: String,
      family: String, style: String, nTables: Int, nGlyphs: Int,
      unitsPerEm: Int)

  private final case class FFail() extends RuntimeException

  private def be16(b: Array[Byte], o: Int): Int = {
    if (o + 2 > b.length) throw FFail()
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def be32(b: Array[Byte], o: Int): Long = {
    if (o + 4 > b.length) throw FFail()
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** Triage over already-located raw tables. */
  private def fromTables(flavor: String, container: String,
      nTables: Int, tables: Map[String, Array[Byte]])
      : Option[FontMeta] = {
    var family = ""
    var style = ""
    tables.get("name").foreach { nm =>
      val count = be16(nm, 2)
      val strOff = be16(nm, 4)
      if (count > MaxTables) throw FFail()
      def rec(nameId: Int): String = {
        var best = ""
        var bestScore = -1
        var i = 0
        while (i < count) {
          val o = 6 + 12 * i
          if (o + 12 > nm.length) throw FFail()
          val plat = be16(nm, o)
          val enc = be16(nm, o + 2)
          val nid = be16(nm, o + 6)
          val len = be16(nm, o + 8)
          val off = be16(nm, o + 10)
          if (nid == nameId && strOff + off + len <= nm.length) {
            val (score, s) =
              if (plat == 3 && (enc == 1 || enc == 10))
                (2, new String(nm, strOff + off, len,
                  java.nio.charset.StandardCharsets.UTF_16BE))
              else if (plat == 1 && enc == 0)
                (1, new String(nm, strOff + off, len,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
              else (0, "")
            if (score > bestScore && s.nonEmpty) {
              best = s; bestScore = score
            }
          }
          i += 1
        }
        best
      }
      family = rec(1)
      style = rec(2)
    }
    var unitsPerEm = -1
    tables.get("head").foreach { hd =>
      if (be32(hd, 12) != 0x5f0f3cf5L) throw FFail() // head magic
      unitsPerEm = be16(hd, 18)
    }
    var nGlyphs = -1
    tables.get("maxp").foreach(mx => nGlyphs = be16(mx, 4))
    if (family.isEmpty && unitsPerEm < 0) return None
    Some(FontMeta(container, flavor, family, style, nTables,
      nGlyphs, unitsPerEm))
  }

  private def sfntTables(b: Array[Byte])
      : (String, Int, Map[String, Array[Byte]]) = {
    val ver = be32(b, 0)
    val flavor =
      if (ver == 0x00010000L) "truetype"
      else if (ver == 0x4f54544fL) "cff" // 'OTTO'
      else throw FFail()
    val n = be16(b, 4)
    if (n <= 0 || n > MaxTables) throw FFail()
    val tables = scala.collection.mutable.Map
      .empty[String, Array[Byte]]
    var i = 0
    while (i < n) {
      val o = 12 + 16 * i
      val tag = new String(b, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val off = be32(b, o + 4 + 4)
      val len = be32(b, o + 12)
      if (off < 0 || len < 0 || off + len > b.length) throw FFail()
      if (tag == "name" || tag == "head" || tag == "maxp")
        tables(tag) = java.util.Arrays.copyOfRange(b, off.toInt,
          (off + len).toInt)
      i += 1
    }
    (flavor, n, tables.toMap)
  }

  /** The WOFF2 known-table tag list (the spec's fixed order). */
  private val Woff2Tags: IndexedSeq[String] = IndexedSeq(
    "cmap", "head", "hhea", "hmtx", "maxp", "name", "OS/2", "post",
    "cvt ", "fpgm", "glyf", "loca", "prep", "CFF ", "VORG", "EBDT",
    "EBLC", "gasp", "hdmx", "kern", "LTSH", "PCLT", "VDMX", "vhea",
    "vmtx", "BASE", "GDEF", "GPOS", "GSUB", "EBSC", "JSTF", "MATH",
    "CBDT", "CBLC", "COLR", "CPAL", "SVG ", "sbix", "acnt", "avar",
    "bdat", "bloc", "bsln", "cvar", "fdsc", "feat", "fmtx", "fvar",
    "gvar", "hsty", "just", "lcar", "mort", "morx", "opbd", "prop",
    "trak", "Zapf", "Silf", "Glat", "Gloc", "Feat", "Sill")

  def fontMeta(b: Array[Byte]): Option[FontMeta] = {
    if (b == null || b.length < 12) return None
    try {
      val magic = be32(b, 0)
      if (magic == 0x00010000L || magic == 0x4f54544fL) {
        val (flavor, n, tables) = sfntTables(b)
        fromTables(flavor, "sfnt", n, tables)
      } else if (magic == 0x774f4646L) { // 'wOFF'
        val flavorV = be32(b, 4)
        val flavor =
          if (flavorV == 0x00010000L) "truetype"
          else if (flavorV == 0x4f54544fL) "cff"
          else return None
        val n = be16(b, 12)
        if (n <= 0 || n > MaxTables) return None
        val tables = scala.collection.mutable.Map
          .empty[String, Array[Byte]]
        var i = 0
        while (i < n) {
          val o = 44 + 20 * i
          val tag = new String(b, o, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          val off = be32(b, o + 4)
          val compLen = be32(b, o + 8)
          val origLen = be32(b, o + 12)
          if (off < 0 || compLen < 0 ||
            off + compLen > b.length) return None
          if (tag == "name" || tag == "head" || tag == "maxp") {
            val raw =
              if (compLen == origLen)
                java.util.Arrays.copyOfRange(b, off.toInt,
                  (off + compLen).toInt)
              else { // zlib
                val inf = new java.util.zip.Inflater()
                try {
                  inf.setInput(b, off.toInt, compLen.toInt)
                  val out = new Array[Byte](origLen.toInt)
                  var got = 0
                  while (got < origLen && !inf.finished()) {
                    val k = inf.inflate(out, got,
                      origLen.toInt - got)
                    if (k == 0 && !inf.finished()) throw FFail()
                    got += k
                  }
                  if (got.toLong != origLen) throw FFail()
                  out
                } catch {
                  case _: java.util.zip.DataFormatException =>
                    throw FFail()
                } finally inf.end()
              }
            tables(tag) = raw
          }
          i += 1
        }
        fromTables(flavor, "woff", n, tables.toMap)
      } else if (magic == 0x774f4632L) { // 'wOF2'
        val flavorV = be32(b, 4)
        val flavor =
          if (flavorV == 0x00010000L) "truetype"
          else if (flavorV == 0x4f54544fL) "cff"
          else return None
        val n = be16(b, 12)
        val compLen = be32(b, 20)
        if (n <= 0 || n > MaxTables || compLen < 0) return None
        // directory: per table a flag byte (+ arbitrary tag), then
        // varint origLength (+ transformLength when transformed)
        var p = 48
        def uBase128(): Long = {
          var v = 0L
          var i2 = 0
          while (i2 < 5) {
            if (p >= b.length) throw FFail()
            val x = b(p) & 0xff
            p += 1
            v = (v << 7) | (x & 0x7fL)
            if ((x & 0x80) == 0) return v
            i2 += 1
          }
          throw FFail()
        }
        final case class Ent(tag: String, origLen: Long,
          storedLen: Long)
        val ents = Seq.newBuilder[Ent]
        var i = 0
        while (i < n) {
          val flags = b(p) & 0xff
          p += 1
          val tagIdx = flags & 0x3f
          val tag =
            if (tagIdx == 0x3f) {
              val t = new String(b, p, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
              p += 4
              t
            } else Woff2Tags(tagIdx)
          val pre = flags >>> 6
          val origLen = uBase128()
          // glyf/loca (and hmtx v1) carry transform lengths when
          // transform version 0 (glyf/loca) or != 0 (others)
          val transformed =
            if (tag == "glyf" || tag == "loca") pre == 0
            else pre != 0
          val storedLen =
            if (transformed) uBase128() else origLen
          ents += Ent(tag, origLen, storedLen)
          i += 1
        }
        val dir = ents.result()
        val blob = Brotli.decompress(
          java.util.Arrays.copyOfRange(b, p,
            math.min(b.length.toLong, p + compLen).toInt))
          .getOrElse(return None)
        val tables = scala.collection.mutable.Map
          .empty[String, Array[Byte]]
        var off = 0L
        for (e <- dir) {
          if (off + e.storedLen > blob.length) return None
          if ((e.tag == "name" || e.tag == "head" ||
            e.tag == "maxp") && e.storedLen == e.origLen)
            tables(e.tag) = java.util.Arrays.copyOfRange(blob,
              off.toInt, (off + e.storedLen).toInt)
          off += e.storedLen
        }
        fromTables(flavor, "woff2", n, tables.toMap)
      } else None
    } catch {
      case _: FFail => None
      // String's (byte[],off,len) ctor throws the String variant
      // on a truncated tag read, so catch the common supertype
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ---------------------------------------------------------------
  // writers: minimal sfnt + the two web containers
  // ---------------------------------------------------------------

  /** A minimal TrueType-flavored sfnt with name/head/maxp. */
  def sfntWrite(family: String, style: String, nGlyphs: Int,
      unitsPerEm: Int): Array[Byte] = {
    def table(tag: String, data: Array[Byte]) = (tag, data)
    val famB = family.getBytes(
      java.nio.charset.StandardCharsets.UTF_16BE)
    val styB = style.getBytes(
      java.nio.charset.StandardCharsets.UTF_16BE)
    val name = new java.io.ByteArrayOutputStream()
    def n16(v: Int): Unit = { name.write((v >> 8) & 0xff)
      name.write(v & 0xff) }
    n16(0); n16(2); n16(6 + 24) // format, count, stringOffset
    n16(3); n16(1); n16(0x409); n16(1); n16(famB.length); n16(0)
    n16(3); n16(1); n16(0x409); n16(2); n16(styB.length)
    n16(famB.length)
    name.write(famB, 0, famB.length)
    name.write(styB, 0, styB.length)
    val head = new Array[Byte](54)
    head(12) = 0x5f; head(13) = 0x0f; head(14) = 0x3c
    head(15) = 0xf5.toByte
    head(18) = ((unitsPerEm >> 8) & 0xff).toByte
    head(19) = (unitsPerEm & 0xff).toByte
    val maxp = new Array[Byte](6)
    maxp(0) = 0; maxp(1) = 1 // version 1.0
    maxp(4) = ((nGlyphs >> 8) & 0xff).toByte
    maxp(5) = (nGlyphs & 0xff).toByte
    val tabs = Seq(table("head", head), table("maxp", maxp),
      table("name", name.toByteArray))
    val out = new java.io.ByteArrayOutputStream()
    def o16(v: Int): Unit = { out.write((v >> 8) & 0xff)
      out.write(v & 0xff) }
    def o32(v: Long): Unit = { o16(((v >> 16) & 0xffff).toInt)
      o16((v & 0xffff).toInt) }
    o32(0x00010000L)
    o16(tabs.length); o16(16); o16(2); o16(0)
    var off = 12 + 16 * tabs.length
    for ((tag, d) <- tabs) {
      tag.foreach(c => out.write(c.toInt))
      o32(0) // checksum: readers must not rely on it for triage
      o32(off.toLong)
      o32(d.length.toLong)
      off += (d.length + 3) & ~3
    }
    for ((_, d) <- tabs) {
      out.write(d, 0, d.length)
      var pad = (4 - (d.length & 3)) & 3
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    out.toByteArray
  }

  /** Wrap an sfnt as WOFF (tables zlib-compressed). */
  def woffWrap(sfnt: Array[Byte]): Array[Byte] = {
    val n = be16(sfnt, 4)
    val out = new java.io.ByteArrayOutputStream()
    def o16(v: Int): Unit = { out.write((v >> 8) & 0xff)
      out.write(v & 0xff) }
    def o32(v: Long): Unit = { o16(((v >> 16) & 0xffff).toInt)
      o16((v & 0xffff).toInt) }
    final case class T(tag: String, data: Array[Byte], comp:
      Array[Byte])
    val tabs = (0 until n).map { i =>
      val o = 12 + 16 * i
      val tag = new String(sfnt, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val off = be32(sfnt, o + 8)
      val len = be32(sfnt, o + 12)
      val d = java.util.Arrays.copyOfRange(sfnt, off.toInt,
        (off + len).toInt)
      val df = new java.util.zip.Deflater()
      df.setInput(d); df.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!df.finished()) buf.write(tmp, 0, df.deflate(tmp))
      df.end()
      val c = buf.toByteArray
      T(tag, d, if (c.length < d.length) c else d)
    }
    o32(0x774f4646L) // wOFF
    o32(0x00010000L)
    o32(0) // total size: patched below
    o16(n); o16(0)
    o32(0) // totalSfntSize (advisory)
    o16(1); o16(0)
    o32(0); o32(0); o32(0) // meta
    o32(0); o32(0) // priv... (44-byte header)
    var off = 44 + 20 * n
    val dir = new java.io.ByteArrayOutputStream()
    def d16(v: Int): Unit = { dir.write((v >> 8) & 0xff)
      dir.write(v & 0xff) }
    def d32(v: Long): Unit = { d16(((v >> 16) & 0xffff).toInt)
      d16((v & 0xffff).toInt) }
    val bodies = new java.io.ByteArrayOutputStream()
    for (t <- tabs) {
      t.tag.foreach(c => dir.write(c.toInt))
      d32(off.toLong)
      d32(t.comp.length.toLong)
      d32(t.data.length.toLong)
      d32(0)
      bodies.write(t.comp, 0, t.comp.length)
      var pad = (4 - (t.comp.length & 3)) & 3
      while (pad > 0) { bodies.write(0); pad -= 1 }
      off += (t.comp.length + 3) & ~3
    }
    dir.writeTo(out)
    bodies.writeTo(out)
    val full = out.toByteArray
    val len = full.length.toLong
    full(8) = ((len >> 24) & 0xff).toByte
    full(9) = ((len >> 16) & 0xff).toByte
    full(10) = ((len >> 8) & 0xff).toByte
    full(11) = (len & 0xff).toByte
    full
  }

  /** Wrap an sfnt as WOFF2 (untransformed tables, one brotli
    * blob through the in-repo encoder).
    */
  def woff2Wrap(sfnt: Array[Byte]): Array[Byte] = {
    val n = be16(sfnt, 4)
    val dir = new java.io.ByteArrayOutputStream()
    val blob = new java.io.ByteArrayOutputStream()
    def base128(v: Long): Unit = {
      val parts = new scala.collection.mutable.ArrayBuffer[Int]()
      var x = v
      do { parts.prepend((x & 0x7f).toInt); x >>>= 7 }
      while (x != 0)
      for (i <- parts.indices)
        dir.write(if (i < parts.length - 1) parts(i) | 0x80
        else parts(i))
    }
    for (i <- 0 until n) {
      val o = 12 + 16 * i
      val tag = new String(sfnt, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val off = be32(sfnt, o + 8)
      val len = be32(sfnt, o + 12)
      val idx = Woff2Tags.indexOf(tag)
      // transform version: glyf/loca use 3 (= untransformed);
      // everything else 0 (= untransformed)
      val pre = if (tag == "glyf" || tag == "loca") 3 else 0
      if (idx >= 0) dir.write((pre << 6) | idx)
      else {
        dir.write((pre << 6) | 0x3f)
        tag.foreach(c => dir.write(c.toInt))
      }
      base128(len)
      blob.write(sfnt, off.toInt, len.toInt)
    }
    val comp = Brotli.encodeStored(blob.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    def o16(v: Int): Unit = { out.write((v >> 8) & 0xff)
      out.write(v & 0xff) }
    def o32(v: Long): Unit = { o16(((v >> 16) & 0xffff).toInt)
      o16((v & 0xffff).toInt) }
    o32(0x774f4632L) // wOF2
    o32(0x00010000L)
    o32(0) // total size (advisory here)
    o16(n); o16(0)
    o32(0) // totalSfntSize
    o32(comp.length.toLong) // totalCompressedSize
    o16(1); o16(0)
    o32(0); o32(0); o32(0) // meta
    o32(0); o32(0) // priv (48-byte header)
    dir.writeTo(out)
    out.write(comp, 0, comp.length)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val fontSchema: StructType = StructType(Seq(
    StructField("container", StringType),
    StructField("flavor", StringType),
    StructField("family", StringType),
    StructField("style", StringType),
    StructField("n_tables", IntegerType),
    StructField("n_glyphs", IntegerType),
    StructField("units_per_em", IntegerType)))

  def decodeFont(bytes: Array[Byte]): Seq[Any] =
    fontMeta(bytes) match {
      case Some(m) => Seq[Any](m.container, m.flavor, m.family,
        m.style, m.nTables, m.nGlyphs, m.unitsPerEm)
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-row synth: planted family/style/glyphs, container
    * cycling sfnt/woff/woff2 by id.
    */
  def synthFonts(df: DataFrame, idCol: String, outCol: String)
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
        val sfnt = sfntWrite(s"Family $id",
          if (id % 2 == 0) "Regular" else "Bold",
          (100 + java.lang.Math.floorMod(id, 900L)).toInt, 2048)
        val bytes = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => sfnt
          case 1 => woffWrap(sfnt)
          case _ => woff2Wrap(sfnt)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
