package graft.operators

/** LZ4 frame + block codec, from the public format specs
  * (lz4_Frame_format.md / lz4_Block_format.md in the lz4 project;
  * xxHash32 from the public xxHash spec — the 64-bit variant lives
  * in [[Zstd.xxhash64]] for zstd's trailer, LZ4 frames use the
  * 32-bit one for all three of their checksums).
  *
  * Decode handles the modern frame (magic 0x184D2204) with every
  * descriptor option — independent AND linked blocks, block
  * checksums, content size, content checksum, dictionary-ID
  * presence — plus skippable frames (0x184D2A5x), the legacy frame
  * (0x184C2102, what `lz4 -l` writes), and concatenated frames,
  * which the reference CLI produces for multi-input cat-style use.
  * Every stored checksum is VERIFIED: header HC, per-block XXH32,
  * content XXH32, and the declared content size. Anything torn,
  * lying, or out of bounds refuses to None — never throws, never
  * returns a prefix.
  *
  * The encoder emits independent ≤64 KiB blocks with content size +
  * content checksum, falling back to an uncompressed block whenever
  * greedy matching does not win. Both directions are pinned against
  * the reference `lz4` CLI in Lz4Spec (its frames decode here
  * byte-exactly; frames written here extract there — recorded at
  * fixture-generation time).
  *
  * Scale: decode is per-value and stateless — a crawl column of
  * .lz4 bodies decodes map-only with no shuffle; the 64 MiB output
  * cap is the same bomb guard every sibling codec carries.
  */
object Lz4 {

  private val MaxOut = 64 << 20

  private val FrameMagic = 0x184d2204
  private val LegacyMagic = 0x184c2102
  private val SkipMagicBase = 0x184d2a50

  // ---------------------------------------------------------------
  // xxHash32 (public spec): LZ4's header/block/content checksum
  // ---------------------------------------------------------------

  private val P1 = 0x9e3779b1
  private val P2 = 0x85ebca77
  private val P3 = 0xc2b2ae3d
  private val P4 = 0x27d4eb2f
  private val P5 = 0x165667b1

  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** XXH32 over `b[off, off+len)` with `seed`. */
  def xxhash32(b: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    var p = off
    val end = off + len
    var acc = 0
    if (len >= 16) {
      var a1 = seed + P1 + P2
      var a2 = seed + P2
      var a3 = seed
      var a4 = seed - P1
      val limit = end - 16
      while (p <= limit) {
        a1 = Integer.rotateLeft(a1 + le32(b, p) * P2, 13) * P1
        a2 = Integer.rotateLeft(a2 + le32(b, p + 4) * P2, 13) * P1
        a3 = Integer.rotateLeft(a3 + le32(b, p + 8) * P2, 13) * P1
        a4 = Integer.rotateLeft(a4 + le32(b, p + 12) * P2, 13) * P1
        p += 16
      }
      acc = Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
        Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
    } else acc = seed + P5
    acc += len
    while (p + 4 <= end) {
      acc = Integer.rotateLeft(acc + le32(b, p) * P3, 17) * P4
      p += 4
    }
    while (p < end) {
      acc = Integer.rotateLeft(acc + (b(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    acc ^= acc >>> 15
    acc *= P2
    acc ^= acc >>> 13
    acc *= P3
    acc ^= acc >>> 16
    acc
  }

  // ---------------------------------------------------------------
  // block decode — into a shared growable output so linked blocks
  // (B.Indep=0) can reference the previous blocks' 64 KiB window
  // ---------------------------------------------------------------

  private final class Out(var buf: Array[Byte], var len: Int) {
    def ensure(n: Int): Boolean = {
      if (len + n > MaxOut) return false
      if (len + n > buf.length) {
        var cap = math.max(buf.length * 2, 1024)
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
      true
    }
  }

  /** Decode one RAW LZ4 block (no frame) — the shape ORC and other
    * columnar containers embed in their compression chunks. None on
    * structural damage or output past `maxOut`.
    */
  def decodeRawBlock(b: Array[Byte], from: Int, until: Int,
      maxOut: Int): Option[Array[Byte]] = {
    if (b == null || from < 0 || until > b.length || from >= until)
      return None
    try {
      val out = new Out(new Array[Byte](math.min(maxOut, 1024)), 0)
      if (!decodeBlock(b, from, until, out) || out.len > maxOut) None
      else Some(java.util.Arrays.copyOf(out.buf, out.len))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Decode one LZ4 block from `b[from, until)` appending to `out`.
    * Matches may reach back past the block start (linked blocks).
    * False on any structural violation.
    */
  private def decodeBlock(b: Array[Byte], from: Int, until: Int,
      out: Out): Boolean = {
    var p = from
    while (p < until) {
      val token = b(p) & 0xff
      p += 1
      // literal run
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) {
          if (p >= until) return false
          x = b(p) & 0xff
          p += 1
          litLen += x
          if (litLen > MaxOut) return false
        }
      }
      if (p + litLen > until) return false
      if (!out.ensure(litLen)) return false
      System.arraycopy(b, p, out.buf, out.len, litLen)
      out.len += litLen
      p += litLen
      if (p == until) return true // last sequence: literals only
      // match
      if (p + 2 > until) return false
      val offset = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      p += 2
      if (offset == 0 || offset > out.len) return false
      var matchLen = (token & 0x0f) + 4
      if ((token & 0x0f) == 15) {
        var x = 255
        while (x == 255) {
          if (p >= until) return false
          x = b(p) & 0xff
          p += 1
          matchLen += x
          if (matchLen > MaxOut) return false
        }
      }
      if (!out.ensure(matchLen)) return false
      var src = out.len - offset
      var k = 0
      while (k < matchLen) { // byte-wise: overlap is the point
        out.buf(out.len) = out.buf(src)
        out.len += 1
        src += 1
        k += 1
      }
    }
    false // a block may not end mid-sequence
  }

  // ---------------------------------------------------------------
  // frame decode
  // ---------------------------------------------------------------

  /** Decode a (possibly concatenated) LZ4 stream: modern frames,
    * legacy frames, skippable frames. None on damage, checksum or
    * declared-size lies, or output past the 64 MiB guard.
    */
  def decodeFrame(b: Array[Byte]): Option[Array[Byte]] =
    try decodeFrame0(b)
    catch { // totality: near-2GB inputs could wrap an Int bound
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeFrame0(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 7) return None
    val out = new Out(new Array[Byte](1024), 0)
    var p = 0
    var frames = 0
    while (p < b.length) {
      if (p + 4 > b.length) return None
      val magic = le32(b, p)
      p += 4
      if (magic == FrameMagic) {
        val np = decodeModern(b, p, out)
        if (np < 0) return None
        p = np
        frames += 1
      } else if (magic == LegacyMagic) {
        val np = decodeLegacy(b, p, out)
        if (np < 0) return None
        p = np
        frames += 1
      } else if ((magic & 0xfffffff0) == SkipMagicBase) {
        if (p + 4 > b.length) return None
        val sz = le32(b, p)
        p += 4
        if (sz < 0 || p + sz > b.length) return None
        p += sz
      } else return None
    }
    if (frames == 0) None
    else Some(java.util.Arrays.copyOf(out.buf, out.len))
  }

  /** Modern frame after its magic; returns next offset or -1. */
  private def decodeModern(b: Array[Byte], from: Int, out: Out)
      : Int = {
    var p = from
    if (p + 3 > b.length) return -1
    val flg = b(p) & 0xff
    val bd = b(p + 1) & 0xff
    if ((flg >>> 6) != 1) return -1 // version
    if ((flg & 0x02) != 0) return -1 // reserved bit
    val hasBlockCk = (flg & 0x10) != 0
    val hasCSize = (flg & 0x08) != 0
    val hasCCk = (flg & 0x04) != 0
    val hasDictId = (flg & 0x01) != 0
    val bmsCode = (bd >>> 4) & 0x07
    if (bmsCode < 4 || (bd & 0x8f) != 0) return -1
    val blockMax = 1 << (8 + 2 * bmsCode) // 4→64K … 7→4M
    var descLen = 2
    var declared = -1L
    if (hasCSize) {
      if (p + descLen + 8 > b.length) return -1
      declared = 0L
      var i = 0
      while (i < 8) {
        declared |= (b(p + descLen + i) & 0xffL) << (8 * i)
        i += 1
      }
      if (declared < 0 || declared > MaxOut) return -1
      descLen += 8
    }
    if (hasDictId) descLen += 4
    if (p + descLen + 1 > b.length) return -1
    val hc = b(p + descLen) & 0xff
    if (((xxhash32(b, p, descLen, 0) >>> 8) & 0xff) != hc) return -1
    p += descLen + 1
    val contentStart = out.len
    var done = false
    while (!done) {
      if (p + 4 > b.length) return -1
      val bsz = le32(b, p)
      p += 4
      if (bsz == 0) done = true
      else {
        val uncompressed = (bsz & 0x80000000) != 0
        val dataLen = bsz & 0x7fffffff
        if (dataLen > blockMax || p + dataLen > b.length) return -1
        if (uncompressed) {
          if (!out.ensure(dataLen)) return -1
          System.arraycopy(b, p, out.buf, out.len, dataLen)
          out.len += dataLen
        } else if (!decodeBlock(b, p, p + dataLen, out)) return -1
        p += dataLen
        if (hasBlockCk) { // over the block data as stored
          if (p + 4 > b.length) return -1
          if (le32(b, p) !=
            xxhash32(b, p - dataLen, dataLen, 0)) return -1
          p += 4
        }
      }
    }
    if (declared >= 0 &&
      (out.len - contentStart).toLong != declared) return -1
    if (hasCCk) {
      if (p + 4 > b.length) return -1
      if (le32(b, p) != xxhash32(out.buf, contentStart,
        out.len - contentStart, 0)) return -1
      p += 4
    }
    p
  }

  /** Legacy frame (`lz4 -l`): raw 8 MiB blocks, no end mark — the
    * frame runs until EOF or the next magic number.
    */
  private def decodeLegacy(b: Array[Byte], from: Int, out: Out)
      : Int = {
    val LegacyBlock = 8 << 20
    var p = from
    var sawBlock = false
    while (p < b.length) {
      if (p + 4 > b.length) return -1
      val v = le32(b, p)
      if (v == FrameMagic || v == LegacyMagic ||
        (v & 0xfffffff0) == SkipMagicBase)
        return if (sawBlock) p else -1
      p += 4
      if (v <= 0 || p + v > b.length) return -1
      val before = out.len
      if (!decodeBlock(b, p, p + v, out)) return -1
      if (out.len - before > LegacyBlock) return -1
      p += v
      sawBlock = true
    }
    if (sawBlock) p else -1
  }

  // ---------------------------------------------------------------
  // encode
  // ---------------------------------------------------------------

  /** Greedy LZ4 block compression of `data[from, until)`; None when
    * the compressed form would not be smaller (caller stores raw).
    */
  private def compressBlock(data: Array[Byte], from: Int, until: Int)
      : Option[Array[Byte]] = {
    val len = until - from
    val out = new java.io.ByteArrayOutputStream(len)
    val HashLog = 13
    val table = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(table, -1)
    @inline def read32(p: Int): Int = le32(data, p)
    @inline def hash(v: Int): Int = (v * P1) >>> (32 - HashLog)
    def writeLen(extra: Int): Unit = {
      var e = extra
      while (e >= 255) { out.write(255); e -= 255 }
      out.write(e)
    }
    def emit(litFrom: Int, litTo: Int, offset: Int, mLen: Int)
        : Unit = {
      val litLen = litTo - litFrom
      val mToken = if (mLen == 0) 0
        else math.min(mLen - 4, 15)
      out.write((math.min(litLen, 15) << 4) | mToken)
      if (litLen >= 15) writeLen(litLen - 15)
      out.write(data, litFrom, litLen)
      if (mLen > 0) {
        out.write(offset & 0xff)
        out.write((offset >>> 8) & 0xff)
        if (mLen - 4 >= 15) writeLen(mLen - 4 - 15)
      }
    }
    var pos = from
    var anchor = from
    // matches may neither start in the last 12 bytes nor cover the
    // last 5 (the spec's end-of-block conditions)
    val mfLimit = until - 12
    val matchLimit = until - 5
    while (pos <= mfLimit && pos + 4 <= until) {
      val h = hash(read32(pos))
      val cand = table(h)
      table(h) = pos
      if (cand >= from && pos - cand <= 0xffff &&
        read32(cand) == read32(pos)) {
        var ml = 4
        while (pos + ml < matchLimit &&
          data(cand + ml) == data(pos + ml)) ml += 1
        emit(anchor, pos, pos - cand, ml)
        pos += ml
        anchor = pos
      } else pos += 1
    }
    emit(anchor, until, 0, 0) // final literals-only sequence
    val bytes = out.toByteArray
    if (bytes.length < len) Some(bytes) else None
  }

  /** Encode a modern single frame: independent ≤64 KiB blocks,
    * content size + content checksum (so the reference CLI verifies
    * the round trip), no dict, no per-block checksums.
    */
  def encodeFrame(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    w32(FrameMagic)
    val desc = new Array[Byte](10)
    desc(0) = 0x6c.toByte // v01 | B.Indep | C.Size | C.Checksum
    desc(1) = 0x40.toByte // BD: 64 KiB max block
    var i = 0
    while (i < 8) {
      desc(2 + i) = ((data.length.toLong >> (8 * i)) & 0xff).toByte
      i += 1
    }
    out.write(desc, 0, 10)
    out.write((xxhash32(desc, 0, 10, 0) >>> 8) & 0xff)
    val Block = 64 << 10
    var p = 0
    while (p < data.length) {
      val n = math.min(Block, data.length - p)
      compressBlock(data, p, p + n) match {
        case Some(c) => w32(c.length); out.write(c, 0, c.length)
        case None =>
          w32(n | 0x80000000)
          out.write(data, p, n)
      }
      p += n
    }
    w32(0) // EndMark
    w32(xxhash32(data, 0, data.length, 0))
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing (mirrors the gzip/zstd roundtrip queries)
  // ---------------------------------------------------------------

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  val lz4TextSchema: StructType = StructType(Seq(
    StructField("lz4_text", StringType)))

  def decodeLz4Text(bytes: Array[Byte]): Seq[Any] =
    decodeFrame(bytes) match {
      case Some(d) => Seq(new String(d,
        java.nio.charset.StandardCharsets.UTF_8))
      case None => Seq(null)
    }

  /** Per-row synth: encode the text column as one LZ4 frame. */
  def synthLz4(df: DataFrame, textCol: String, outCol: String)
      : DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ encodeFrame(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }(enc)
  }
}
