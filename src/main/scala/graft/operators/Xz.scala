package graft.operators

/** xz / LZMA2 / LZMA decoder — the remaining major archive codec
  * (tar.xz dataset drops, kernel/source distributions, long-term
  * dump archival): a full from-spec implementation of the LZMA
  * range coder and state machine (11-bit adaptive probabilities,
  * matched-literal decoding, rep-distance ring, position slots with
  * reverse bit-trees and aligned direct bits), the LZMA2 chunk
  * layer (dict/state/props resets, uncompressed chunks), and the xz
  * container (stream header/footer, block headers, index, ALL FOUR
  * check types — none/CRC32/CRC64/SHA-256 — verified, multi-stream
  * concatenation with stream padding). Golden streams produced by
  * the reference liblzma across presets 0/6/9e and every check type
  * pin the decoder (XzSpec); the fixture encoder emits valid xz
  * containers with uncompressed LZMA2 chunks, themselves verified
  * by the reference tool at generation time.
  *
  * Refusal contract as everywhere: structural damage, any CRC/hash
  * mismatch, an unfinished range coder, or an unsupported filter
  * chain → None, never silently-wrong bytes. Output capped.
  * Supported chains (round 15): bare LZMA2, and the delta (0x03) or
  * x86-BCJ (0x04) pre-filters in front of it — the forms real
  * tar.xz executable/sample drops carry, both pinned bit-exactly
  * against reference-CLI fixtures.
  *
  * Reference behavior studied: pytrousse has no compression layer
  * (/root/reference/src/trousse/dataset.py:1); beyond-parity
  * crawl-curation surface beside [[Zstd]]/[[Brotli]]/[[Bzip2]].
  */
object Xz {

  private val MaxOut = 64 << 20

  private final case class XzFail(why: String)
    extends RuntimeException(why, null, false, false)
  private def fail(why: String): Nothing = throw XzFail(why)

  // CRC-64/XZ (ECMA-182 polynomial, reflected)
  private val Crc64Table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0) (c >>> 1) ^ 0xC96C5795D7870F42L
          else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[graft] def crc64(b: Array[Byte], from: Int, until: Int)
      : Long = {
    var c = -1L
    var i = from
    while (i < until) {
      c = (c >>> 8) ^ Crc64Table(((c ^ b(i)) & 0xff).toInt)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, from, until - from)
    c.getValue
  }

  // ------------------------------------------------------------------
  // LZMA range decoder
  // ------------------------------------------------------------------

  private final class RC(d: Array[Byte], var pos: Int, end: Int) {
    if (pos + 5 > end || d(pos) != 0) fail("range coder head")
    var code: Int = ((d(pos + 1) & 0xff) << 24) |
      ((d(pos + 2) & 0xff) << 16) | ((d(pos + 3) & 0xff) << 8) |
      (d(pos + 4) & 0xff)
    var range: Int = -1 // 0xFFFFFFFF
    pos += 5
    private def nextByte(): Int = {
      if (pos >= end) fail("rc eof")
      val b = d(pos) & 0xff
      pos += 1
      b
    }
    @inline def norm(): Unit =
      if ((range & 0xff000000) == 0) {
        range = range << 8
        code = (code << 8) | nextByte()
      }
    def bit(probs: Array[Short], i: Int): Int = {
      norm()
      val p = probs(i) & 0xffff
      val bound = (range >>> 11) * p
      // unsigned compare
      if ((code ^ Int.MinValue) < (bound ^ Int.MinValue)) {
        range = bound
        probs(i) = (p + ((2048 - p) >> 5)).toShort
        0
      } else {
        range -= bound
        code -= bound
        probs(i) = (p - (p >> 5)).toShort
        1
      }
    }
    def tree(probs: Array[Short], base: Int, nbits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nbits) { m = (m << 1) | bit(probs, base + m); i += 1 }
      m - (1 << nbits)
    }
    def rtree(probs: Array[Short], base: Int, nbits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nbits) {
        val b = bit(probs, base + m)
        m = (m << 1) | b
        sym |= b << i
        i += 1
      }
      sym
    }
    def direct(nbits: Int): Int = {
      var res = 0
      var i = 0
      while (i < nbits) {
        norm()
        range = range >>> 1
        res <<= 1
        if ((code ^ Int.MinValue) >= (range ^ Int.MinValue)) {
          code -= range
          res |= 1
        }
        i += 1
      }
      res
    }
    def finished: Boolean = code == 0
  }

  // ------------------------------------------------------------------
  // LZMA state machine (decoding into the shared output buffer)
  // ------------------------------------------------------------------

  private final class Out(maxOut: Int) {
    var buf = new Array[Byte](8192)
    var len = 0
    def ensure(n: Int): Unit = {
      if (len.toLong + n > maxOut) fail("output too large")
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    def add(b: Byte): Unit = { ensure(1); buf(len) = b; len += 1 }
  }

  private final class Lzma(lc: Int, lp: Int, pb: Int) {
    if (lc > 8 || lp > 4 || pb > 4) fail("bad lzma props")
    if (lc + lp > 4) fail("lc+lp over LZMA2 limit")
    var state = 0
    val reps = new Array[Int](4)
    var isMatch: Array[Short] = _
    var isRep: Array[Short] = _
    var isRepG0: Array[Short] = _
    var isRepG1: Array[Short] = _
    var isRepG2: Array[Short] = _
    var isRep0Long: Array[Short] = _
    var posSlot: Array[Short] = _
    var specPos: Array[Short] = _
    var align: Array[Short] = _
    var lenC: Array[Short] = _
    var repLenC: Array[Short] = _
    var lit: Array[Short] = _
    resetState()
    def resetState(): Unit = {
      state = 0
      java.util.Arrays.fill(reps, 0)
      def a(n: Int) = Array.fill[Short](n)(1024)
      isMatch = a(12 << 4); isRep = a(12); isRepG0 = a(12)
      isRepG1 = a(12); isRepG2 = a(12); isRep0Long = a(12 << 4)
      posSlot = a(4 * 64); specPos = a(115); align = a(16)
      lenC = a(2 + 16 * 8 + 16 * 8 + 256)
      repLenC = a(2 + 16 * 8 + 16 * 8 + 256)
      lit = a(0x300 << (lc + lp))
    }
    private def decLen(rc: RC, probs: Array[Short], posState: Int)
        : Int =
      if (rc.bit(probs, 0) == 0)
        2 + rc.tree(probs, 2 + posState * 8, 3)
      else if (rc.bit(probs, 1) == 0)
        10 + rc.tree(probs, 2 + 128 + posState * 8, 3)
      else 18 + rc.tree(probs, 2 + 256, 8)

    /** True once the LZMA end marker (distance 0xFFFFFFFF) was
      * decoded — only the LZMA_ALONE unknown-size form uses it.
      */
    var hitMarker = false

    /** Decode exactly `limit` bytes into `out` (`limit` < 0 = run
      * until the end marker, the LZMA_ALONE unknown-size form).
      * `dictStart` is the output index where the current dictionary
      * window began.
      */
    def run(rc: RC, out: Out, limit: Int, dictStart: Int): Unit = {
      val pbMask = (1 << pb) - 1
      val lpMask = (1 << lp) - 1
      val end = if (limit < 0) Int.MaxValue else out.len + limit
      while (out.len < end && !hitMarker) {
        val posState = (out.len - dictStart) & pbMask
        if (rc.bit(isMatch, (state << 4) + posState) == 0) {
          val prev =
            if (out.len > dictStart) out.buf(out.len - 1) & 0xff
            else 0
          val litState = (((out.len - dictStart) & lpMask) << lc) +
            (prev >>> (8 - lc))
          val base = 0x300 * litState
          var sym = 1
          if (state < 7) {
            while (sym < 0x100) sym = (sym << 1) | rc.bit(lit, base + sym)
          } else {
            if (reps(0) >= out.len - dictStart) fail("match byte oob")
            var matchByte = out.buf(out.len - reps(0) - 1) & 0xff
            var break = false
            while (sym < 0x100 && !break) {
              val matchBit = (matchByte >> 7) & 1
              matchByte = (matchByte << 1) & 0xff
              val b = rc.bit(lit, base + ((1 + matchBit) << 8) + sym)
              sym = (sym << 1) | b
              if (matchBit != b) break = true
            }
            while (sym < 0x100) sym = (sym << 1) | rc.bit(lit, base + sym)
          }
          out.add((sym - 0x100).toByte)
          state = if (state < 4) 0 else if (state < 10) state - 3
            else state - 6
        } else {
          var length = 0
          if (rc.bit(isRep, state) == 1) {
            if (rc.bit(isRepG0, state) == 0) {
              if (rc.bit(isRep0Long, (state << 4) + posState) == 0) {
                state = if (state < 7) 9 else 11
                if (reps(0) >= out.len - dictStart) fail("rep oob")
                out.add(out.buf(out.len - reps(0) - 1))
                length = -1 // handled
              }
            } else {
              var dist = 0
              if (rc.bit(isRepG1, state) == 0) dist = reps(1)
              else {
                if (rc.bit(isRepG2, state) == 0) dist = reps(2)
                else {
                  dist = reps(3)
                  reps(3) = reps(2)
                }
                reps(2) = reps(1)
              }
              reps(1) = reps(0)
              reps(0) = dist
            }
            if (length == 0) {
              length = decLen(rc, repLenC, posState)
              state = if (state < 7) 8 else 11
            }
          } else {
            reps(3) = reps(2); reps(2) = reps(1); reps(1) = reps(0)
            length = decLen(rc, lenC, posState)
            state = if (state < 7) 7 else 10
            val lenState = math.min(length - 2, 3)
            val slot = rc.tree(posSlot, lenState * 64, 6)
            var dist = slot
            if (slot >= 4) {
              val ndb = (slot >> 1) - 1
              dist = (2 | (slot & 1)) << ndb
              if (slot < 14)
                dist += rc.rtree(specPos, dist - slot - 1, ndb)
              else {
                dist += rc.direct(ndb - 4) << 4
                dist += rc.rtree(align, 0, 4)
              }
            }
            if (dist == -1) {
              if (limit >= 0) fail("end marker in lzma2")
              hitMarker = true
              length = 0
            } else reps(0) = dist
          }
          if (length > 0) {
            val d = reps(0)
            // unsigned: d must be < bytes available in this window
            if ((d ^ Int.MinValue) >=
              ((out.len - dictStart) ^ Int.MinValue))
              fail("distance too far")
            if (out.len + length > end) fail("match over chunk")
            out.ensure(length)
            var k = 0
            while (k < length) {
              out.buf(out.len) = out.buf(out.len - d - 1)
              out.len += 1
              k += 1
            }
          }
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // LZMA2 chunk layer
  // ------------------------------------------------------------------

  /** Decode one LZMA2 chunk sequence; returns the end position. */
  private def lzma2(d: Array[Byte], pos0: Int, end: Int, out: Out)
      : Int = {
    var pos = pos0
    var lz: Lzma = null
    var dictStart = 0
    var needDictReset = true
    def u16(p: Int): Int = {
      if (p + 2 > end) fail("lzma2 eof")
      ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
    }
    var done = false
    while (!done) {
      if (pos >= end) fail("lzma2 eof")
      val ctrl = d(pos) & 0xff
      pos += 1
      if (ctrl == 0) done = true
      else if (ctrl < 0x80) {
        if (ctrl > 2) fail("bad lzma2 control")
        val size = u16(pos) + 1
        pos += 2
        if (ctrl == 1) { dictStart = out.len; needDictReset = false }
        else if (needDictReset) fail("missing dict reset")
        if (pos + size > end) fail("chunk oob")
        out.ensure(size)
        System.arraycopy(d, pos, out.buf, out.len, size)
        out.len += size
        pos += size
        if (lz != null) lz.resetState()
      } else {
        val usize = ((ctrl & 0x1f) << 16) + u16(pos) + 1
        val csize = u16(pos + 2) + 1
        pos += 4
        val reset = (ctrl >> 5) & 3
        if (reset >= 2) {
          if (pos >= end) fail("lzma2 eof")
          val p = d(pos) & 0xff
          pos += 1
          if (p >= 9 * 5 * 5) fail("bad props byte")
          val lc = p % 9
          val rest = p / 9
          lz = new Lzma(lc, rest % 5, rest / 5)
        } else if (reset == 1) {
          if (lz == null) fail("state reset before props")
          lz.resetState()
        }
        if (reset == 3) { dictStart = out.len; needDictReset = false }
        else if (needDictReset) fail("missing dict reset")
        if (lz == null) fail("lzma chunk before props")
        if (pos + csize > end) fail("chunk oob")
        val rc = new RC(d, pos, pos + csize)
        lz.run(rc, out, usize, dictStart)
        if (rc.pos != pos + csize || !rc.finished)
          fail("range coder did not settle")
        pos += csize
      }
    }
    pos
  }

  // ------------------------------------------------------------------
  // xz container
  // ------------------------------------------------------------------

  private val Magic = Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0)

  private def mbint(d: Array[Byte], pos0: Int, end: Int)
      : (Long, Int) = {
    var v = 0L
    var i = 0
    var pos = pos0
    var done = false
    while (!done) {
      if (pos >= end || i > 8) fail("bad multibyte int")
      val b = d(pos) & 0xff
      v |= (b & 0x7fL) << (7 * i)
      pos += 1
      i += 1
      if ((b & 0x80) == 0) done = true
    }
    (v, pos)
  }

  private def le32(d: Array[Byte], p: Int): Long =
    (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)
  private def le64(d: Array[Byte], p: Int): Long =
    le32(d, p) | (le32(d, p + 4) << 32)

  /** Decode one xz STREAM starting at `pos`; returns end position. */
  private def stream(d: Array[Byte], pos0: Int, out: Out): Int = {
    var pos = pos0
    if (pos + 12 > d.length) fail("short header")
    var i = 0
    while (i < 6) {
      if (d(pos + i) != Magic(i)) fail("bad magic")
      i += 1
    }
    if (d(pos + 6) != 0) fail("bad stream flags")
    val check = d(pos + 7) & 0x0f
    if ((d(pos + 7) & 0xf0) != 0) fail("bad stream flags")
    if (le32(d, pos + 8) != crc32(d, pos + 6, pos + 8))
      fail("stream header crc")
    val flags0 = d(pos + 6); val flags1 = d(pos + 7)
    pos += 12
    val records = Seq.newBuilder[(Long, Long)]
    var nBlocks = 0
    var atIndex = false
    while (!atIndex) {
      if (pos >= d.length) fail("eof before index")
      if (d(pos) == 0) atIndex = true
      else {
        val hsize = ((d(pos) & 0xff) + 1) * 4
        if (pos + hsize > d.length) fail("block header oob")
        if (le32(d, pos + hsize - 4) != crc32(d, pos, pos + hsize - 4))
          fail("block header crc")
        val bflags = d(pos + 1) & 0xff
        if ((bflags & 0x3c) != 0) fail("reserved block flags")
        val nFilters = (bflags & 3) + 1
        var p = pos + 2
        if ((bflags & 0x40) != 0) p = mbint(d, p, pos + hsize)._2
        if ((bflags & 0x80) != 0) p = mbint(d, p, pos + hsize)._2
        // supported chains: [lzma2] or [delta|x86-BCJ, lzma2] — the
        // executable/delta pre-filters real tar.xz drops carry
        if (nFilters > 2) fail("filter chains unsupported")
        var preFilter = -1 // 0x03 delta, 0x04 x86
        var deltaDist = 0
        if (nFilters == 2) {
          val (fid0, q1) = mbint(d, p, pos + hsize)
          fid0 match {
            case 0x03 =>
              val (psz0, q2) = mbint(d, q1, pos + hsize)
              if (psz0 != 1) fail("bad delta props")
              deltaDist = (d(q2) & 0xff) + 1
              preFilter = 0x03
              p = q2 + 1
            case 0x04 =>
              val (psz0, q2) = mbint(d, q1, pos + hsize)
              // x86 BCJ: no props, or a 4-byte start offset we only
              // accept as zero (nonzero starts are not emitted by
              // the reference tool for whole streams)
              if (psz0 == 0) p = q2
              else if (psz0 == 4 && le32(d, q2) == 0) p = q2 + 4
              else fail("bad x86 props")
              preFilter = 0x04
            case _ => fail("unsupported pre-filter")
          }
        }
        val (fid, p2) = mbint(d, p, pos + hsize)
        if (fid != 0x21) fail("not lzma2")
        val (psz, p3) = mbint(d, p2, pos + hsize)
        if (psz != 1) fail("bad props size")
        val dictByte = d(p3) & 0xff
        if (dictByte > 40) fail("bad dict size")
        p = p3 + 1
        while (p < pos + hsize - 4) {
          if (d(p) != 0) fail("header padding")
          p += 1
        }
        val bstart = pos + hsize
        val before = out.len
        val endPos = lzma2(d, bstart, d.length, out)
        // inverse pre-filter over this block's decoded bytes
        if (preFilter == 0x03)
          deltaDecode(out.buf, before, out.len, deltaDist)
        else if (preFilter == 0x04)
          x86Decode(out.buf, before, out.len)
        val unpadded = hsize.toLong + (endPos - bstart)
        var cpos = endPos
        while ((cpos - pos0) % 4 != 0) {
          if (cpos >= d.length || d(cpos) != 0) fail("block padding")
          cpos += 1
        }
        val checkLen = check match {
          case 0 => 0
          case 1 =>
            if (cpos + 4 > d.length) fail("eof in check")
            val got = new java.util.zip.CRC32
            got.update(out.buf, before, out.len - before)
            if (le32(d, cpos) != got.getValue) fail("crc32 mismatch")
            4
          case 4 =>
            if (cpos + 8 > d.length) fail("eof in check")
            val c = {
              var cc = -1L
              var k = before
              while (k < out.len) {
                cc = (cc >>> 8) ^
                  Crc64Table(((cc ^ out.buf(k)) & 0xff).toInt)
                k += 1
              }
              ~cc
            }
            if (le64(d, cpos) != c) fail("crc64 mismatch")
            8
          case 10 =>
            if (cpos + 32 > d.length) fail("eof in check")
            val md = java.security.MessageDigest.getInstance("SHA-256")
            md.update(out.buf, before, out.len - before)
            val want = md.digest()
            var k = 0
            while (k < 32) {
              if (d(cpos + k) != want(k)) fail("sha256 mismatch")
              k += 1
            }
            32
          case _ => fail("unsupported check type")
        }
        records += ((unpadded + checkLen, (out.len - before).toLong))
        nBlocks += 1
        if (nBlocks > (1 << 20)) fail("block bomb")
        pos = cpos + checkLen
      }
    }
    // index
    val ipos = pos
    pos += 1
    val recs = records.result()
    val (nrec, p4) = mbint(d, pos, d.length)
    pos = p4
    if (nrec != recs.length) fail("index count")
    for ((u, s) <- recs) {
      val (uu, pa) = mbint(d, pos, d.length)
      val (ss, pb2) = mbint(d, pa, d.length)
      pos = pb2
      if (uu != u || ss != s) fail("index record mismatch")
    }
    while ((pos - ipos) % 4 != 0) {
      if (pos >= d.length || d(pos) != 0) fail("index padding")
      pos += 1
    }
    if (pos + 4 > d.length) fail("eof in index crc")
    if (le32(d, pos) != crc32(d, ipos, pos)) fail("index crc")
    pos += 4
    val indexSize = pos - ipos
    // footer
    if (pos + 12 > d.length) fail("short footer")
    if (le32(d, pos) != crc32(d, pos + 4, pos + 10)) fail("footer crc")
    val backward = le32(d, pos + 4)
    if ((backward + 1) * 4 != indexSize) fail("backward size")
    if (d(pos + 8) != flags0 || d(pos + 9) != flags1)
      fail("footer flags mismatch")
    if (d(pos + 10) != 'Y' || d(pos + 11) != 'Z') fail("footer magic")
    pos + 12
  }

  /** Raw LZMA1 stream with explicit props and a known output size —
    * the form ZIP method 14 and other embedded uses carry. `end`
    * bounds the compressed bytes; trailing end markers are accepted.
    */
  /** Inverse delta filter (xz filter 0x03): byte-wise running sum
    * at the declared distance.
    */
  private def deltaDecode(b: Array[Byte], from: Int, until: Int,
      dist: Int): Unit = {
    var i = from + dist
    while (i < until) {
      b(i) = (b(i) + b(i - dist)).toByte
      i += 1
    }
    // the first `dist` bytes are stored verbatim
  }

  /** Inverse x86 BCJ filter (xz filter 0x04): converts the
    * absolute-ized E8/E9 call/jump targets back to relative, with
    * the reference tool's 5-byte proximity mask — semantics pinned
    * by xz-CLI goldens in XzSpec (a wrong mask bit breaks them).
    */
  private[operators] def x86Decode(b: Array[Byte], from: Int,
      until: Int): Unit = x86Code(b, from, until, encode = false)

  /** Forward x86 BCJ (fixture writers): relative→absolute. */
  private[operators] def x86Encode(b: Array[Byte], from: Int,
      until: Int): Unit = x86Code(b, from, until, encode = true)

  private def x86Code(b: Array[Byte], from: Int, until: Int,
      encode: Boolean): Unit = {
    val size = until - from
    if (size < 5) return
    val allowed = Array(true, true, true, false, true, false, false,
      false)
    val bitNum = Array(0, 1, 2, 2, 3, 3, 3, 3)
    def msb(v: Int): Boolean = v == 0 || v == 0xff
    var prevMask = 0
    var prevPos = -5L // fresh-stream init (uint32 -5 in the ref)
    val limit = size - 5
    var bp = 0
    while (bp <= limit) {
      val b0 = b(from + bp) & 0xff
      if (b0 != 0xe8 && b0 != 0xe9) bp += 1
      else {
        val offset = bp - prevPos
        prevPos = bp
        if (offset > 5) prevMask = 0
        else {
          var i = 0L
          while (i < offset) {
            prevMask &= 0x77
            prevMask <<= 1
            i += 1
          }
        }
        val b4 = b(from + bp + 4) & 0xff
        if (msb(b4) && allowed((prevMask >> 1) & 0x7) &&
            (prevMask >> 1) < 0x10) {
          var src = ((b4.toLong << 24) |
            ((b(from + bp + 3) & 0xffL) << 16) |
            ((b(from + bp + 2) & 0xffL) << 8) |
            (b(from + bp + 1) & 0xffL)) & 0xffffffffL
          var dest = 0L
          var loop = true
          while (loop) {
            dest =
              if (encode) (src + (bp.toLong + 5)) & 0xffffffffL
              else (src - (bp.toLong + 5)) & 0xffffffffL
            if (prevMask == 0) loop = false
            else {
              val i = bitNum(prevMask >> 1)
              val bb = ((dest >> (24 - i * 8)) & 0xff).toInt
              if (!msb(bb)) loop = false
              else src = dest ^ ((1L << (32 - i * 8)) - 1)
            }
          }
          b(from + bp + 4) =
            (if (((dest >> 24) & 1) != 0) 0xff else 0x00).toByte
          b(from + bp + 3) = ((dest >> 16) & 0xff).toByte
          b(from + bp + 2) = ((dest >> 8) & 0xff).toByte
          b(from + bp + 1) = (dest & 0xff).toByte
          bp += 5
          prevMask = 0
        } else {
          prevMask |= 1
          if (msb(b4)) prevMask |= 0x10
          bp += 1
        }
      }
    }
  }

  /** Decode one bare LZMA2 chunk sequence (as stored by a 7z
    * folder's 0x21 coder: control bytes through the 0x00 terminator,
    * props carried inside the chunks themselves). None for damage.
    */
  private[operators] def lzma2Raw(b: Array[Byte], pos: Int, end: Int,
      maxOut: Int): Option[Array[Byte]] = {
    try {
      val out = new Out(maxOut)
      lzma2(b, pos, end, out)
      Some(java.util.Arrays.copyOf(out.buf, out.len))
    } catch {
      case XzFail(_) => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private[operators] def lzma1Raw(b: Array[Byte], pos: Int, end: Int,
      props: Int, outLen: Int): Option[Array[Byte]] = {
    try {
      if (props >= 9 * 5 * 5) fail("bad props")
      if (outLen < 0 || outLen > MaxOut) fail("bad size")
      val lc = props % 9
      val rest = props / 9
      val lz = new Lzma(lc, rest % 5, rest / 5)
      val out = new Out(MaxOut)
      val rc = new RC(b, pos, end)
      lz.run(rc, out, outLen, 0)
      Some(java.util.Arrays.copyOf(out.buf, out.len))
    } catch {
      case XzFail(_) => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Decode a legacy `.lzma` (LZMA_ALONE) payload: 1 props byte,
    * 4-byte LE dict size, 8-byte LE uncompressed size (all-ones =
    * unknown, terminated by the LZMA end marker), then one raw
    * LZMA1 stream. None for damage; a declared size is exact.
    */
  def decompressAlone(b: Array[Byte], maxOut: Int = MaxOut)
      : Option[Array[Byte]] = {
    if (b == null || b.length < 18) return None
    try {
      val p = b(0) & 0xff
      if (p >= 9 * 5 * 5) fail("bad props")
      val lc = p % 9
      val rest = p / 9
      val usize = le64(b, 5)
      val lz = new Lzma(lc, rest % 5, rest / 5)
      val out = new Out(maxOut)
      val rc = new RC(b, 13, b.length)
      if (usize == -1L) {
        // unknown size: the stream is end-marker terminated
        lz.run(rc, out, -1, 0)
        if (!lz.hitMarker) fail("no end marker")
      } else {
        if (usize < 0 || usize > maxOut) fail("bad size")
        lz.run(rc, out, usize.toInt, 0)
      }
      if (!rc.finished) fail("range coder did not settle")
      Some(java.util.Arrays.copyOf(out.buf, out.len))
    } catch {
      case XzFail(_) => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Decode a (possibly multi-stream) xz payload. None for anything
    * structurally damaged or failing any of the four check types.
    */
  def decompress(b: Array[Byte], maxOut: Int = MaxOut)
      : Option[Array[Byte]] = {
    if (b == null || b.length < 32) return None
    try {
      val out = new Out(maxOut)
      var pos = 0
      var streams = 0
      while (pos < b.length) {
        // stream padding between streams: 4-byte-aligned zeros
        if (b(pos) == 0) {
          val start = pos
          while (pos < b.length && b(pos) == 0) pos += 1
          if ((pos - start) % 4 != 0) fail("stream padding")
          if (pos >= b.length) {
            if (streams == 0) fail("only padding")
          }
        } else {
          pos = stream(b, pos, out)
          streams += 1
          if (streams > 4096) fail("stream bomb")
        }
      }
      if (streams == 0) fail("no streams")
      Some(java.util.Arrays.copyOf(out.buf, out.len))
    } catch {
      case XzFail(_) => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture encoder: a real xz container with uncompressed LZMA2
  // chunks (the container/check layers are fully exercised; the
  // entropy layer is pinned by the reference goldens)
  // ------------------------------------------------------------------

  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 256)
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    def mb(v0: Long): Unit = {
      var v = v0
      while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>= 7 }
      out.write(v.toInt)
    }
    // stream header, check = CRC32
    Magic.foreach(m => out.write(m & 0xff))
    out.write(0); out.write(1)
    val hdrCrc = {
      val c = new java.util.zip.CRC32
      c.update(Array[Byte](0, 1)); c.getValue
    }
    w32(hdrCrc)
    if (data.length == 0) {
      // empty stream: no blocks, empty index
      val ibytes = Array[Byte](0, 0) // indicator + count 0
      out.write(0); out.write(0)
      // pad to 4: 2 bytes written → 2 zero pad
      out.write(0); out.write(0)
      val c = new java.util.zip.CRC32
      c.update(Array[Byte](0, 0, 0, 0))
      w32(c.getValue)
      val indexSize = 8
      val fb = new java.io.ByteArrayOutputStream()
      fb.write(((indexSize / 4 - 1) & 0xff).toInt)
      fb.write((((indexSize / 4 - 1) >> 8) & 0xff).toInt)
      fb.write((((indexSize / 4 - 1) >> 16) & 0xff).toInt)
      fb.write((((indexSize / 4 - 1) >> 24) & 0xff).toInt)
      fb.write(0); fb.write(1)
      val fc = new java.util.zip.CRC32
      fc.update(fb.toByteArray)
      w32(fc.getValue)
      fb.toByteArray.foreach(b2 => out.write(b2 & 0xff))
      out.write('Y'); out.write('Z')
      return out.toByteArray
    }
    // one block: header (LZMA2, dict size byte 40 = max)
    val bh = new java.io.ByteArrayOutputStream()
    bh.write(0) // size placeholder
    bh.write(0) // flags: 1 filter, no sizes
    bh.write(0x21); bh.write(1); bh.write(40)
    while ((bh.size() + 4) % 4 != 0) bh.write(0)
    val bhBytes = bh.toByteArray
    bhBytes(0) = ((bhBytes.length + 4) / 4 - 1).toByte
    val bhc = new java.util.zip.CRC32
    bhc.update(bhBytes)
    bhBytes.foreach(b2 => out.write(b2 & 0xff))
    w32(bhc.getValue)
    val blockStart = out.size() - bhBytes.length - 4
    // LZMA2: uncompressed chunks, first resets the dict
    var off = 0
    var first = true
    while (off < data.length) {
      val n = math.min(1 << 16, data.length - off)
      out.write(if (first) 1 else 2)
      out.write(((n - 1) >> 8) & 0xff); out.write((n - 1) & 0xff)
      out.write(data, off, n)
      off += n
      first = false
    }
    out.write(0) // end of LZMA2
    val unpadded0 = out.size() - blockStart
    while (out.size() % 4 != 0) out.write(0)
    val dc = new java.util.zip.CRC32
    dc.update(data)
    w32(dc.getValue)
    val unpadded = unpadded0 + 4 // + check
    // index
    val ix = new java.io.ByteArrayOutputStream()
    ix.write(0) // indicator
    ix.write(1) // count (mbint, small)
    def mbTo(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while (v >= 0x80) { o.write(((v & 0x7f) | 0x80).toInt); v >>= 7 }
      o.write(v.toInt)
    }
    mbTo(ix, unpadded.toLong)
    mbTo(ix, data.length.toLong)
    while ((ix.size()) % 4 != 0) ix.write(0)
    val ixBytes = ix.toByteArray
    val ic = new java.util.zip.CRC32
    ic.update(ixBytes)
    ixBytes.foreach(b2 => out.write(b2 & 0xff))
    w32(ic.getValue)
    val indexSize = ixBytes.length + 4
    // footer
    val fb = new java.io.ByteArrayOutputStream()
    val bw = indexSize / 4 - 1
    fb.write(bw & 0xff); fb.write((bw >> 8) & 0xff)
    fb.write((bw >> 16) & 0xff); fb.write((bw >> 24) & 0xff)
    fb.write(0); fb.write(1)
    val fc = new java.util.zip.CRC32
    fc.update(fb.toByteArray)
    w32(fc.getValue)
    fb.toByteArray.foreach(b2 => out.write(b2 & 0xff))
    out.write('Y'); out.write('Z')
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing (mirrors the other codecs)
  // ------------------------------------------------------------------

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.{BinaryType, StringType,
    StructField, StructType}

  val xzTextSchema: StructType = StructType(Seq(
    StructField("xz_text", StringType)))

  def decodeXzText(bytes: Array[Byte]): Seq[Any] =
    decompress(bytes) match {
      case Some(plain) => Seq[Any](new String(plain,
        java.nio.charset.StandardCharsets.UTF_8))
      case None => Seq[Any](null)
    }

  def synthXz(df: DataFrame, idCol: String, textCol: String,
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
}
