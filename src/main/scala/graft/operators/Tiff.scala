package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** TIFF strip decode to luma — scans and faxes ship as TIFF, and
  * until now only their header dims were readable
  * ([[Multimodal.tiffDims]]): pixels never reached the shared
  * luma/hash contract, so TIFF scans could not near-dup. This
  * decoder feeds [[Multimodal.imageDecodeLuma]]'s unified path with
  * the sixth raster codec.
  *
  * Coverage: both byte orders, 8-bit grayscale (SamplesPerPixel 1),
  * strip organization (any RowsPerStrip, SHORT or LONG offset/count
  * arrays, inline or out-of-line), Compression 1 (none), 32773
  * (PackBits), and 5 (TIFF-variant LZW: MSB-first codes with the
  * early-change width rule — the GIF decoder's LSB-first machinery
  * does not transfer, so the variant lives here), horizontal
  * differencing (Predictor 2), and both photometric polarities
  * (WhiteIsZero inverts). Everything else — tiles, other bit depths,
  * RGB, other compressions — classifies as None, the untrusted-byte
  * contract every codec here shares.
  */
object Tiff {

  private val MaxDim = 1 << 15
  private val MaxPixels = 1 << 26
  private val MaxStrips = 1 << 16

  private final case class TiffFail(why: String)
    extends RuntimeException(why, null, false, false)
  private def fail(why: String): Nothing = throw TiffFail(why)

  /** Strip decode to (width, height, luma). */
  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 8) return None
    val little =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)
        false
      else return None
    def r16(o: Int): Int =
      if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def r32(o: Int): Long =
      if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    try {
      val ifd0 = r32(4)
      if (ifd0 < 8 || ifd0 + 2 > b.length) fail("bad ifd offset")
      val base = ifd0.toInt
      val n = r16(base)
      if (n <= 0 || n > 512) fail("bad entry count")
      var w = -1L; var h = -1L; var spp = 1L; var bps = 8L
      var compression = 1L; var photometric = 1L
      var rowsPerStrip = Long.MaxValue; var predictor = 1L
      var offT = -1; var offO = -1; var offN = 0
      var cntT = -1; var cntO = -1; var cntN = 0
      var e = 0
      while (e < n) {
        val off = base + 2 + 12 * e
        if (off + 12 > b.length) fail("entry oob")
        val tag = r16(off)
        val typ = r16(off + 2)
        val count = r32(off + 4)
        def scalar(): Long =
          if (typ == 3) r16(off + 8).toLong
          else if (typ == 4) r32(off + 8)
          else fail(s"tag $tag type $typ")
        tag match {
          case 256 => w = scalar()
          case 257 => h = scalar()
          case 258 =>
            if (count != 1) fail("multi-sample BitsPerSample")
            bps = scalar()
          case 259 => compression = scalar()
          case 262 => photometric = scalar()
          case 273 =>
            if (count < 1 || count > MaxStrips) fail("strip count")
            offT = typ; offN = count.toInt
            offO = if (count == 1) off + 8
              else {
                val o = r32(off + 8)
                if (o < 0 || o > b.length) fail("offsets oob")
                o.toInt
              }
          case 277 => spp = scalar()
          case 278 => rowsPerStrip = scalar()
          case 279 =>
            if (count < 1 || count > MaxStrips) fail("count count")
            cntT = typ; cntN = count.toInt
            cntO = if (count == 1) off + 8
              else {
                val o = r32(off + 8)
                if (o < 0 || o > b.length) fail("counts oob")
                o.toInt
              }
          case 317 => predictor = scalar()
          case _ => ()
        }
        e += 1
      }
      if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        w * h > MaxPixels) fail("bad dims")
      if (spp != 1 || bps != 8) fail("only 8-bit gray supported")
      if (photometric != 0 && photometric != 1)
        fail("unsupported photometric")
      if (predictor != 1 && predictor != 2)
        fail("unsupported predictor")
      if (offT < 0 || cntT < 0) fail("missing strip tags")
      if (offN != cntN) fail("offset/count length mismatch")
      if (rowsPerStrip <= 0) fail("bad RowsPerStrip")
      val rps =
        if (rowsPerStrip >= h) h.toInt else rowsPerStrip.toInt
      val nStrips = ((h + rps - 1) / rps).toInt
      if (nStrips != offN) fail("strip count vs rows mismatch")

      def arr(t: Int, o: Int, i: Int): Long =
        if (t == 3) r16(o + 2 * i).toLong
        else if (t == 4) r32(o + 4 * i)
        else fail("bad strip array type")

      val wi = w.toInt
      val hi = h.toInt
      val luma = new Array[Int](wi * hi)
      var strip = 0
      var row = 0
      while (strip < nStrips) {
        val sOff = arr(offT, offO, strip)
        val sLen = arr(cntT, cntO, strip)
        if (sOff < 0 || sLen < 0 || sOff + sLen > b.length)
          fail("strip oob")
        val rows = math.min(rps, hi - row)
        val want = rows * wi
        val data = compression match {
          case 1 =>
            if (sLen != want) fail("uncompressed strip size")
            java.util.Arrays.copyOfRange(b, sOff.toInt,
              (sOff + sLen).toInt)
          case 5 =>
            lzwDecode(b, sOff.toInt, (sOff + sLen).toInt, want)
          case 32773 =>
            packBitsDecode(b, sOff.toInt, (sOff + sLen).toInt, want)
          case other => fail(s"unsupported compression $other")
        }
        // predictor 2: horizontal differencing, per row
        if (predictor == 2) {
          var r = 0
          while (r < rows) {
            var x = 1
            while (x < wi) {
              data(r * wi + x) =
                ((data(r * wi + x) + data(r * wi + x - 1)) & 0xff)
                  .toByte
              x += 1
            }
            r += 1
          }
        }
        var k = 0
        while (k < want) {
          val v = data(k) & 0xff
          luma(row * wi + k) = if (photometric == 0) 255 - v else v
          k += 1
        }
        row += rows
        strip += 1
      }
      Some((wi, hi, luma))
    } catch {
      case TiffFail(_) => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** TIFF-variant LZW: MSB-first code packing, clear 256 / EOI 257,
    * dictionary from 258, 9→12-bit widths with the EARLY-CHANGE rule
    * (width grows when the NEXT code to assign reaches 2^width − 1 —
    * one code earlier than GIF).
    */
  private def lzwDecode(b: Array[Byte], from: Int, until: Int,
      nOut: Int): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nOut)
    var outN = 0
    var next = 258
    var width = 9
    var prev = -1
    var acc = 0L; var accBits = 0; var bp = from
    val seq = new Array[Byte](4096)

    def writeSeq(code: Int): Byte = { // returns first byte
      var c = code
      var n = 0
      while (c >= 258) {
        seq(n) = suffix(c); n += 1
        c = prefix(c)
        if (n >= 4096) fail("lzw chain runaway")
      }
      if (c >= 256) fail("lzw bad literal")
      if (outN + n + 1 > nOut) fail("lzw overrun")
      out(outN) = c.toByte; outN += 1
      var i = n - 1
      while (i >= 0) { out(outN) = seq(i); outN += 1; i -= 1 }
      c.toByte
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      if (c >= 256) fail("lzw bad first")
      c.toByte
    }

    while (outN < nOut) {
      while (accBits < width) {
        if (bp >= until) fail("lzw truncated")
        acc = (acc << 8) | (b(bp) & 0xffL)
        accBits += 8; bp += 1
      }
      val code = ((acc >> (accBits - width)) & ((1L << width) - 1))
        .toInt
      accBits -= width
      if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else if (code == Eoi) {
        fail("lzw early eoi")
      } else if (prev == -1) {
        if (code >= 256) fail("lzw first code not literal")
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        var fb: Byte = 0
        if (code < next && code != Clear && code != Eoi) {
          fb = writeSeq(code)
        } else if (code == next) { // KwKwK
          fb = firstByte(prev)
          // prev's sequence followed by its first byte
          var c = prev
          var n = 0
          while (c >= 258) { seq(n) = suffix(c); n += 1; c = prefix(c) }
          if (outN + n + 2 > nOut) fail("lzw overrun")
          out(outN) = c.toByte; outN += 1
          var i = n - 1
          while (i >= 0) { out(outN) = seq(i); outN += 1; i -= 1 }
          out(outN) = fb; outN += 1
        } else fail("lzw code from the future")
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = fb
          next += 1
          // TIFF "early change": the decoder widens one code before
          // the table actually fills (libtiff widens after adding
          // entry 510/1022/2046, i.e. when next reaches 2^w - 1).
          // The encoder, one dictionary entry ahead at the moment a
          // code is read (the classic LZW lag), widens at 2^w.
          // Pinned bit-exactly against JDK ImageIO's TIFF LZW codec
          // in LzwGoldenSpec.
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }

  /** PackBits: control n ≥ 0 → n+1 literals; −1…−127 → repeat next
    * byte 1−n times; −128 no-op.
    */
  private def packBitsDecode(b: Array[Byte], from: Int, until: Int,
      nOut: Int): Array[Byte] = {
    val out = new Array[Byte](nOut)
    var outN = 0
    var p = from
    while (outN < nOut) {
      if (p >= until) fail("packbits truncated")
      val ctl = b(p); p += 1
      if (ctl >= 0) {
        val n = ctl + 1
        if (p + n > until || outN + n > nOut) fail("packbits overrun")
        System.arraycopy(b, p, out, outN, n)
        p += n; outN += n
      } else if (ctl != -128) {
        val n = 1 - ctl
        if (p >= until || outN + n > nOut) fail("packbits overrun")
        val v = b(p); p += 1
        java.util.Arrays.fill(out, outN, outN + n, v)
        outN += n
      }
    }
    if (outN != nOut) fail("packbits size mismatch")
    out
  }

  // ------------------------------------------------------------------
  // encoder (fixture side)
  // ------------------------------------------------------------------

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        out.write(((acc >> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    val dict = new java.util.HashMap[Int, Integer]()
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(256) // leading CLEAR, the conventional TIFF start
    var prev = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (prev == -1) prev = c
      else {
        val key = (prev << 8) | c
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // encoder side of early change: one entry AFTER the
          // decoder's 2^w - 1 (see decoder comment; ImageIO-pinned)
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4093) { put(256); reset() } // stay under cap
          prev = c
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    put(257) // EOI
    if (accBits > 0)
      out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  private def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // find a run
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal stretch until next run of ≥3 (or 128 bytes)
        var lit = 1
        while (i + lit < data.length && lit < 128 && !(
          i + lit + 2 < data.length &&
          data(i + lit) == data(i + lit + 1) &&
          data(i + lit) == data(i + lit + 2))) lit += 1
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** Real 8-bit-gray TIFF writer: header + strips + IFD (+ out-of-
    * line offset/count arrays for multi-strip files). `compression`:
    * 1 none, 5 LZW, 32773 PackBits; `photometric` 0 stores inverted
    * bytes (WhiteIsZero); `predictor` 2 row-differences before LZW.
    */
  def tiffEncodeGray(w: Int, h: Int, pix: Array[Int],
      compression: Int, bigEndian: Boolean, photometric: Int = 1,
      rowsPerStrip: Int = 16, predictor: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && pix.length == w * h, "bad dims")
    require(Seq(1, 5, 32773).contains(compression), "compression")
    require(photometric == 0 || photometric == 1, "photometric")
    require(predictor == 1 || (predictor == 2 && compression == 5),
      "predictor 2 only with LZW here")
    val rps = math.min(rowsPerStrip, h)
    val nStrips = (h + rps - 1) / rps
    // per-strip source bytes (with photometric + predictor applied)
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val src = new Array[Byte](rows * w)
      var r = 0
      while (r < rows) {
        var x = 0
        while (x < w) {
          val v0 = pix((s * rps + r) * w + x) & 0xff
          val v = if (photometric == 0) 255 - v0 else v0
          src(r * w + x) = v.toByte
          x += 1
        }
        if (predictor == 2) {
          var xx = w - 1
          while (xx > 0) {
            src(r * w + xx) =
              ((src(r * w + xx) - src(r * w + xx - 1)) & 0xff).toByte
            xx -= 1
          }
        }
        r += 1
      }
      compression match {
        case 1 => src
        case 5 => lzwEncode(src)
        case _ => packBitsEncode(src)
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { w8((v >> 24).toInt); w8((v >> 16).toInt)
        w8((v >> 8).toInt); w8(v.toInt) }
      else { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt)
        w8((v >> 24).toInt) }

    w8(if (bigEndian) 'M' else 'I'); w8(if (bigEndian) 'M' else 'I')
    w16(42)
    // layout: header(8) | strip data | IFD | out-of-line arrays
    val stripOffsets = new Array[Long](nStrips)
    var pos = 8L
    for (s <- 0 until nStrips) {
      stripOffsets(s) = pos
      pos += strips(s).length
    }
    val ifdOff = pos
    w32(ifdOff)
    for (s <- strips) out.write(s, 0, s.length)

    val nTags = if (predictor == 2) 10 else 9
    val arraysOff = ifdOff + 2 + nTags * 12 + 4
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) }
      else w32(value)
    }
    w16(nTags)
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, photometric)
    if (nStrips == 1) entry(273, 4, 1, stripOffsets(0))
    else entry(273, 4, nStrips, arraysOff)
    entry(277, 3, 1, 1)
    entry(278, 4, 1, rps)
    if (nStrips == 1) entry(279, 4, 1, strips(0).length)
    else entry(279, 4, nStrips, arraysOff + 4L * nStrips)
    if (predictor == 2) entry(317, 3, 1, 2)
    w32(0) // next IFD
    if (nStrips > 1) {
      for (s <- 0 until nStrips) w32(stripOffsets(s))
      for (s <- 0 until nStrips) w32(strips(s).length)
    }
    out.toByteArray
  }

  /** Checkerboard TIFF synthesizer — the same analytic pattern the
    * other five raster codecs hash: 8×8 cell grid of a/b with phase.
    * `compCol` cycles none/LZW/PackBits, `beCol` the byte order;
    * every 5th doc (comp 0 + be 1) additionally exercises
    * WhiteIsZero inversion, every LZW doc the row predictor.
    */
  def synthCheckerTiff(df: DataFrame, wCol: String, hCol: String,
      aCol: String, bCol: String, phaseCol: String, compCol: String,
      beCol: String, outCol: String): DataFrame = {
    val (wi, hi, ai, bi, pi, ci, ei) = (df.schema.fieldIndex(wCol),
      df.schema.fieldIndex(hCol), df.schema.fieldIndex(aCol),
      df.schema.fieldIndex(bCol), df.schema.fieldIndex(phaseCol),
      df.schema.fieldIndex(compCol), df.schema.fieldIndex(beCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val w = r.getInt(wi); val h = r.getInt(hi)
        val a = r.getInt(ai); val b = r.getInt(bi)
        val ph = r.getInt(pi)
        val comp = r.getInt(ci) match {
          case 0 => 1; case 1 => 5; case _ => 32773
        }
        val be = r.getInt(ei) == 1
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cell = (8 * x / w) + (8 * y / h) + ph
            pix(y * w + x) = if (cell % 2 == 0) a else b
            x += 1
          }
          y += 1
        }
        val photometric = if (comp == 1 && be) 0 else 1
        val predictor = if (comp == 5) 2 else 1
        val bytes = tiffEncodeGray(w, h, pix, comp, be, photometric,
          rowsPerStrip = 7, predictor)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
