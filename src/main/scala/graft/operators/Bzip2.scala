package graft.operators

/** bzip2 codec — the dump-distribution format (Wikipedia dumps,
  * Common Crawl index shards, classic tar.bz2 datasets ship in it):
  * full from-spec decode of the BWT + MTF + RLE + multi-table
  * Huffman stack, with both CRC layers VERIFIED (per-block CRC over
  * the reconstructed bytes and the combined stream CRC), plus a
  * real fixture encoder so oracle queries face genuine bzip2
  * streams. Golden streams produced by the reference bzip2
  * implementation pin the decoder in both directions (Bzip2Spec).
  *
  * Format walked (public format documentation; the container is
  * BIT-packed, MSB-first, blocks are not byte-aligned):
  * `BZh<level>` stream header; per block: the 48-bit block magic,
  * stored CRC, the deprecated randomized flag (refused), the BWT
  * origin pointer, the two-level used-symbol bitmap, 2..6 Huffman
  * tables with delta-coded lengths, MTF+unary-coded table selectors
  * switching every 50 symbols, RUNA/RUNB bijective-base-2 zero runs
  * through the MTF alphabet, then the inverse BWT and the RLE1
  * (4-byte-run + count) expansion; 48-bit end magic + stream CRC;
  * concatenated streams (pbzip2 output) supported. Any structural
  * damage or CRC mismatch refuses — never silently-wrong bytes.
  *
  * Scale: map-only per-row byte work like [[Zstd]]/[[Brotli]]; the
  * decoder allocates per call (the 900 KiB max block is the spec's
  * own bound).
  *
  * Reference behavior studied: pytrousse has no compression layer
  * (/root/reference/src/trousse/dataset.py:1); beyond-parity
  * crawl-curation surface.
  */
object Bzip2 {

  private val MaxOut = 64 << 20

  private final case class Bzip2Fail(why: String)
    extends RuntimeException(why, null, false, false)
  private def fail(why: String): Nothing = throw Bzip2Fail(why)

  // bzip2's CRC-32: polynomial 0x04c11db7, MSB-first (NOT the
  // reflected zlib variant), init ~0, final complement
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7
          else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private final class Crc {
    private var v = 0xffffffff
    def update(b: Byte): Unit =
      v = (v << 8) ^ CrcTable(((v >>> 24) ^ (b & 0xff)) & 0xff)
    def value: Int = ~v
  }

  private final class Reader(b: Array[Byte]) {
    var pos = 0 // bit index, MSB-first
    private val limit = b.length.toLong * 8
    def bit(): Int = {
      val p = pos
      if (p >= limit) fail("eof")
      pos = p + 1
      (b(p >> 3) >> (7 - (p & 7))) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bits48(): Long = {
      (bits(24).toLong << 24) | (bits(24).toLong & 0xffffffL)
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def atEnd: Boolean = pos >= limit
    def remainingBits: Long = limit - pos
  }

  private val BlockMagic = 0x314159265359L
  private val EndMagic = 0x177245385090L

  /** Canonical Huffman decoder over lengths 1..23, codes assigned in
    * (length, symbol-index) order — the bzip2 canonical form.
    */
  private final class Huff(lens: Array[Int]) {
    private val count = new Array[Int](24)
    private val syms: Array[Int] = {
      var n = 0
      lens.foreach { l =>
        if (l < 1 || l > 23) fail("bad code length")
        count(l) += 1
        n += 1
      }
      val out = new Array[Int](n)
      var k = 0
      var l = 1
      while (l <= 23) {
        var s = 0
        while (s < lens.length) {
          if (lens(s) == l) { out(k) = s; k += 1 }
          s += 1
        }
        l += 1
      }
      out
    }
    def read(r: Reader): Int = {
      var code = 0
      var first = 0
      var idx = 0
      var l = 1
      while (l <= 23) {
        code = (code << 1) | r.bit()
        val c = count(l)
        if (code - first < c) return syms(idx + code - first)
        idx += c
        first = (first + c) << 1
        l += 1
      }
      fail("bad huffman code")
    }
  }

  /** Decode one block's BWT buffer (post-MTF/RLE2) + verify its CRC
    * after inverse BWT and RLE1; returns the original bytes.
    */
  private def decodeBlock(r: Reader, maxBlock: Int,
      out: java.io.ByteArrayOutputStream, budget: Int): Int = {
    val storedCrc = r.bits(24) << 8 | r.bits(8)
    if (r.bit() != 0) fail("randomized blocks unsupported")
    val origPtr = r.bits(24)
    // two-level used-symbol map
    val ranges = r.bits(16)
    val used = new Array[Boolean](256)
    var nUsed = 0
    var i = 0
    while (i < 16) {
      if ((ranges & (0x8000 >>> i)) != 0) {
        val bitsv = r.bits(16)
        var j = 0
        while (j < 16) {
          if ((bitsv & (0x8000 >>> j)) != 0) {
            used(i * 16 + j) = true
            nUsed += 1
          }
          j += 1
        }
      }
      i += 1
    }
    if (nUsed == 0) fail("empty symbol map")
    val alpha = nUsed + 2
    val nGroups = r.bits(3)
    if (nGroups < 2 || nGroups > 6) fail("bad group count")
    val nSelectors = r.bits(15)
    if (nSelectors < 1) fail("no selectors")
    // selectors: unary + MTF over group ids
    val selMtf = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSelectors)
    i = 0
    while (i < nSelectors) {
      var j = 0
      while (r.bit() == 1) {
        j += 1
        if (j >= nGroups) fail("bad selector")
      }
      val v = selMtf(j)
      while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
      selMtf(0) = v
      selectors(i) = v
      i += 1
    }
    // delta-coded code lengths per group
    val tables = new Array[Huff](nGroups)
    var g = 0
    while (g < nGroups) {
      val lens = new Array[Int](alpha)
      var len = r.bits(5)
      var s = 0
      while (s < alpha) {
        var guard = 0
        while (r.bit() == 1) {
          if (r.bit() == 0) len += 1 else len -= 1
          if (len < 1 || len > 23) fail("bad delta length")
          guard += 1
          if (guard > 64) fail("length loop")
        }
        lens(s) = len
        s += 1
      }
      tables(g) = new Huff(lens)
      g += 1
    }
    // MTF alphabet over the used byte values
    val mtf = new Array[Int](nUsed)
    var k = 0
    i = 0
    while (i < 256) {
      if (used(i)) { mtf(k) = i; k += 1 }
      i += 1
    }
    // symbol stream → BWT buffer
    val bwt = new Array[Byte](maxBlock)
    var n = 0
    var groupPos = 0
    var selIdx = -1
    var table: Huff = null
    def nextSym(): Int = {
      if (groupPos == 0) {
        selIdx += 1
        if (selIdx >= nSelectors) fail("selectors exhausted")
        table = tables(selectors(selIdx))
        groupPos = 50
      }
      groupPos -= 1
      table.read(r)
    }
    val eob = alpha - 1
    var run = 0L
    var runK = 0
    var done = false
    while (!done) {
      val s = nextSym()
      if (s <= 1) { // RUNA / RUNB
        run += (s + 1).toLong << runK
        runK += 1
        if (run > maxBlock) fail("run too long")
      } else {
        if (run > 0) {
          val b = mtf(0).toByte
          if (n + run > maxBlock) fail("block overflow")
          var c = 0L
          while (c < run) { bwt(n) = b; n += 1; c += 1 }
          run = 0; runK = 0
        }
        if (s == eob) done = true
        else {
          // MTF decode of index s-1
          var j = s - 1
          val v = mtf(j)
          while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
          mtf(0) = v
          if (n >= maxBlock) fail("block overflow")
          bwt(n) = v.toByte
          n += 1
        }
      }
    }
    if (origPtr >= n) fail("origPtr out of range")
    // inverse BWT
    val cum = new Array[Int](257)
    i = 0
    while (i < n) { cum((bwt(i) & 0xff) + 1) += 1; i += 1 }
    i = 1
    while (i <= 256) { cum(i) += cum(i - 1); i += 1 }
    val tt = new Array[Int](n)
    i = 0
    while (i < n) {
      val c = bwt(i) & 0xff
      tt(cum(c)) = i
      cum(c) += 1
      i += 1
    }
    // walk + RLE1 expansion + CRC
    val crc = new Crc
    var j2 = tt(origPtr)
    var emitted = 0
    var prev = -1
    var runLen = 0
    var produced = 0
    while (emitted < n) {
      val b = bwt(j2) & 0xff
      j2 = tt(j2)
      emitted += 1
      if (runLen == 4) {
        // b is the repeat COUNT for the preceding 4-byte run
        var c = 0
        while (c < b) {
          out.write(prev); crc.update(prev.toByte); produced += 1
          c += 1
        }
        if (produced > budget) fail("output too large")
        runLen = 0
        prev = -1
      } else {
        if (b == prev) runLen += 1 else { runLen = 1; prev = b }
        out.write(b); crc.update(b.toByte); produced += 1
        if (produced > budget) fail("output too large")
      }
    }
    if (runLen == 4) fail("truncated RLE1 run")
    if (crc.value != storedCrc) fail("block crc mismatch")
    storedCrc
  }

  /** Decode a (possibly multi-stream) bzip2 payload. None for
    * anything structurally damaged or CRC-failing. Trailing bytes
    * after a complete stream are tolerated only if they form
    * further streams (the reference tool's multi-stream behavior);
    * other trailing garbage refuses.
    */
  def decompress(b: Array[Byte], maxOut: Int = MaxOut)
      : Option[Array[Byte]] = {
    if (b == null || b.length < 10) return None
    try {
      val r = new Reader(b)
      // size HINT only — clamp so inputs past ~715 MB cannot
      // overflow Int into a negative initial capacity
      val out = new java.io.ByteArrayOutputStream(
        math.max(16L, math.min(b.length.toLong * 3, maxOut.toLong))
          .toInt)
      var streams = 0
      var more = true
      while (more) {
        if (r.bits(8) != 'B' || r.bits(8) != 'Z' || r.bits(8) != 'h')
          fail("bad stream header")
        val level = r.bits(8) - '0'
        if (level < 1 || level > 9) fail("bad level")
        val maxBlock = level * 100000
        var streamCrc = 0
        var blocks = true
        while (blocks) {
          val magic = r.bits48()
          if (magic == BlockMagic) {
            val blockCrc = decodeBlock(r, maxBlock, out,
              maxOut - out.size)
            streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^
              blockCrc
          } else if (magic == EndMagic) {
            val stored = r.bits(24) << 8 | r.bits(8)
            if (stored != streamCrc) fail("stream crc mismatch")
            blocks = false
          } else fail("bad block magic")
        }
        streams += 1
        r.alignByte()
        more = r.remainingBits >= 80 // another full header possible
        if (!more && r.remainingBits > 0) {
          // sub-header trailing bits: must be zero padding only if
          // less than a potential stream; non-zero junk refuses
          while (!r.atEnd) if (r.bit() != 0) fail("trailing garbage")
        }
      }
      Some(out.toByteArray)
    } catch {
      case Bzip2Fail(_) => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------------
  // Spark plumbing (mirrors Zstd/Brotli)
  // ------------------------------------------------------------------

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.{BinaryType, StringType,
    StructField, StructType}

  val bzip2TextSchema: StructType = StructType(Seq(
    StructField("bzip2_text", StringType)))

  /** Decode kernel for `Multimodal.decodeBatches`. */
  def decodeBzip2Text(bytes: Array[Byte]): Seq[Any] =
    decompress(bytes) match {
      case Some(plain) => Seq[Any](new String(plain,
        java.nio.charset.StandardCharsets.UTF_8))
      case None => Seq[Any](null)
    }

  /** Per-row bzip2 synthesizer. */
  def synthBzip2(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ compress(text.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // encoder (fixture side)
  // ------------------------------------------------------------------

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def bits48(v: Long): Unit = {
      bits(((v >> 24) & 0xffffff).toInt, 24)
      bits((v & 0xffffff).toInt, 24)
    }
    def result(): Array[Byte] = {
      while (nBits != 0) bit(0)
      out.toByteArray
    }
  }

  /** BWT of the ROTATIONS of `s` (not suffixes) via prefix doubling:
    * O(n log² n), immune to the repetitive fixtures that would send
    * a naive rotation sort quadratic. Returns (lastColumn, origPtr).
    */
  private[graft] def bwtEncode(s: Array[Byte]): (Array[Byte], Int) = {
    val n = s.length
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    var order = Array.tabulate(n)(identity)
    var k = 1
    while (k < n) {
      val kk = k
      val rk = rank
      def key(i: Int): (Int, Int) = (rk(i), rk((i + kk) % n))
      order = order.sortBy(key)
      val next = new Array[Int](n)
      var r = 0
      i = 1
      next(order(0)) = 0
      while (i < n) {
        if (key(order(i)) != key(order(i - 1))) r += 1
        next(order(i)) = r
        i += 1
      }
      rank = next
      if (r == n - 1) k = n // all distinct: done
      else k <<= 1
    }
    val last = new Array[Byte](n)
    var orig = -1
    i = 0
    while (i < n) {
      val rot = order(i)
      if (rot == 0) orig = i
      last(i) = s((rot + n - 1) % n)
      i += 1
    }
    (last, orig)
  }

  /** Encode `data` as a real single-stream bzip2 payload (level
    * picked from the data size; two identical Huffman tables — the
    * spec minimum — with real canonical lengths from the block's
    * symbol frequencies).
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val w = new Writer
    w.bits('B', 8); w.bits('Z', 8); w.bits('h', 8)
    val level = math.min(9, math.max(1, (data.length + 99999) / 100000))
    w.bits('0' + level, 8)
    val maxBlock = level * 100000
    var streamCrc = 0
    if (data.length == 0) {
      // an empty stream: end magic with combined CRC 0
      w.bits48(EndMagic)
      w.bits(0, 24); w.bits(0, 8)
      return w.result()
    }
    // chunk the ORIGINAL bytes and RLE1-encode each chunk
    // independently, so every block's RLE1 stream is self-contained
    // (a 4-run's count byte can never land in the next block); the
    // 4/5 cap keeps rle1 ≤ maxBlock even at the worst 4→5 expansion
    val chunkCap = maxBlock / 5 * 4
    var off = 0
    while (off < data.length) {
      val chunkLen = math.min(chunkCap, data.length - off)
      val chunk = java.util.Arrays.copyOfRange(data, off,
        off + chunkLen)
      off += chunkLen
      val block = {
        val o = new java.io.ByteArrayOutputStream(chunkLen + 16)
        var i = 0
        while (i < chunk.length) {
          val b = chunk(i) & 0xff
          var run = 1
          while (i + run < chunk.length && run < 255 + 4 &&
            (chunk(i + run) & 0xff) == b) run += 1
          if (run >= 4) {
            var c = 0
            while (c < 4) { o.write(b); c += 1 }
            o.write(run - 4)
          } else {
            var c = 0
            while (c < run) { o.write(b); c += 1 }
          }
          i += run
        }
        o.toByteArray
      }
      val blockCrc = {
        val crc = new Crc
        chunk.foreach(crc.update)
        crc.value
      }
      streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
      w.bits48(BlockMagic)
      w.bits(blockCrc >>> 8, 24); w.bits(blockCrc & 0xff, 8)
      w.bit(0) // not randomized
      val (bwt, origPtr) = bwtEncode(block)
      w.bits(origPtr, 24)
      // used-symbol map
      val used = new Array[Boolean](256)
      bwt.foreach(b => used(b & 0xff) = true)
      var ranges = 0
      var i = 0
      while (i < 16) {
        var j = 0
        var any = false
        while (j < 16) { if (used(i * 16 + j)) any = true; j += 1 }
        if (any) ranges |= 0x8000 >>> i
        i += 1
      }
      w.bits(ranges, 16)
      i = 0
      while (i < 16) {
        if ((ranges & (0x8000 >>> i)) != 0) {
          var v = 0
          var j = 0
          while (j < 16) {
            if (used(i * 16 + j)) v |= 0x8000 >>> j
            j += 1
          }
          w.bits(v, 16)
        }
        i += 1
      }
      val symOf = new Array[Int](256)
      var nUsed = 0
      i = 0
      while (i < 256) {
        if (used(i)) { symOf(i) = nUsed; nUsed += 1 }
        i += 1
      }
      val alpha = nUsed + 2
      // MTF + RLE2
      val mtf = new Array[Int](nUsed)
      var k2 = 0
      i = 0
      while (i < 256) {
        if (used(i)) { mtf(k2) = i; k2 += 1 }
        i += 1
      }
      val syms = Seq.newBuilder[Int]
      var zeroRun = 0L
      def flushRun(): Unit = {
        var r2 = zeroRun
        while (r2 > 0) {
          val d = (((r2 - 1) % 2) + 1).toInt // 1=RUNA, 2=RUNB
          syms += (d - 1)
          r2 = (r2 - d) / 2
        }
        zeroRun = 0
      }
      bwt.foreach { b0 =>
        val b = b0 & 0xff
        var j = 0
        while (mtf(j) != b) j += 1
        if (j == 0) zeroRun += 1
        else {
          flushRun()
          syms += (j + 1)
          while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
          mtf(0) = b
        }
      }
      flushRun()
      syms += (alpha - 1) // EOB
      val symArr = syms.result()
      // canonical lengths (cap 20; two identical tables). Every
      // alphabet slot needs a length ≥ 1, so unused symbols get
      // frequency 1 — the reference encoder's own trick, keeping
      // the code COMPLETE (an artificial length for a zero-freq
      // symbol would oversubscribe the canonical code space)
      val freq = new Array[Long](alpha)
      java.util.Arrays.fill(freq, 1L)
      symArr.foreach(freq(_) += 1)
      val lens = Brotli.huffLengths(freq, 20)
      val huffCodes = {
        val codes = new Array[Int](alpha)
        var code = 0
        var prev = 0
        var l = 1
        while (l <= 23) {
          var s = 0
          while (s < alpha) {
            if (lens(s) == l) {
              code <<= (l - prev); prev = l
              codes(s) = code
              code += 1
            }
            s += 1
          }
          l += 1
        }
        codes
      }
      val nGroups = 2
      val nSelectors = (symArr.length + 49) / 50
      w.bits(nGroups, 3)
      w.bits(nSelectors, 15)
      var s2 = 0
      while (s2 < nSelectors) { w.bit(0); s2 += 1 } // all table 0
      var g2 = 0
      while (g2 < nGroups) {
        var cur = lens(0)
        w.bits(cur, 5)
        var s3 = 0
        while (s3 < alpha) {
          val want = lens(s3)
          while (cur < want) { w.bit(1); w.bit(0); cur += 1 }
          while (cur > want) { w.bit(1); w.bit(1); cur -= 1 }
          w.bit(0)
          s3 += 1
        }
        g2 += 1
      }
      symArr.foreach(s3 => w.bits(huffCodes(s3), lens(s3)))
    }
    w.bits48(EndMagic)
    w.bits(streamCrc >>> 8, 24); w.bits(streamCrc & 0xff, 8)
    w.result()
  }
}
