package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** From-scratch FLAC PCM decode — the all-integer lossless codec
  * (fixed + LPC predictors over Rice-coded residuals), which is
  * exactly the exact-arithmetic idiom the audio operators already
  * use. Until now audio near-dup pairing consumed PCM16 WAV only;
  * FLAC is the dominant lossless crawl format, so a WAV original and
  * its FLAC re-encode could not pair. Decoding FLAC back to the same
  * interleaved PCM16 routes it through the SAME windowed-energy
  * signature ([[Multimodal.signatureFromPcm]]), so
  * `audioDupPairs` pairs across containers.
  *
  * Coverage (decoder): STREAMINFO + metadata-block walk, frame sync
  * and header (blocksize/rate/channel-assignment/sample-size codes,
  * UTF-8-coded frame number, CRC-8), subframe types CONSTANT /
  * VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32, quantized
  * coefficients with arithmetic shift), partitioned Rice residuals
  * (both 4- and 5-bit parameter methods, escape-to-raw partitions),
  * wasted bits, stereo decorrelation (left/side, right/side,
  * mid/side with the 17-bit side channel), and frame CRC-16.
  * 16-bit streams only — anything else classifies as None, the
  * house contract for untrusted bytes (never a thrown task).
  *
  * The encoder is the oracle side: it writes genuinely compressed
  * frames (not just VERBATIM) so the oracle queries face the full
  * predictor + Rice decode chain.
  */
object Flac {

  private val MaxSamples = 1 << 26 // 64M interleaved samples cap

  private final case class FlacFail(why: String)
    extends RuntimeException(why, null, false, false)
  private def fail(why: String): Nothing = throw FlacFail(why)

  // ------------------------------------------------------------------
  // bit I/O (MSB-first, the FLAC bit order)
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // within current byte, 0 = MSB

    def bitOffsetInByte: Int = bitPos
    def position: Int = bytePos

    def readBit(): Int = {
      if (bytePos >= b.length) fail("eof in bitstream")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n-bit two's-complement signed read. */
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readBits(n)
      val sign = 1L << (n - 1)
      (if ((v & sign) != 0) v - (1L << n) else v).toInt
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) fail("unary runaway")
      }
      q
    }

    def alignByte(): Unit =
      if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0

    def writeBit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1)
      nAcc += 1
      if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }

    def writeSigned(v: Int, n: Int): Unit =
      writeBits(v.toLong & ((1L << n) - 1), n)

    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }

    def alignByte(): Unit = while (nAcc != 0) writeBit(0)

    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ------------------------------------------------------------------
  // CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
  // ------------------------------------------------------------------

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------------
  // decoder
  // ------------------------------------------------------------------

  /** Full PCM decode: (interleaved samples, channels, rate). None
    * for non-FLAC, non-16-bit, CRC-damaged, or malformed input.
    */
  def decodePcm16(b: Array[Byte])
      : Option[(Array[Int], Int, Long)] = {
    if (b == null || b.length < 42) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
      return None
    try {
      // metadata walk: STREAMINFO must come first (spec)
      var p = 4
      var last = false
      var rate = -1L; var channels = -1; var bps = -1
      var totalSamples = -1L
      var first = true
      while (!last) {
        if (p + 4 > b.length) fail("truncated metadata")
        last = (b(p) & 0x80) != 0
        val typ = b(p) & 0x7f
        val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
          (b(p + 3) & 0xff)
        if (p + 4 + len > b.length) fail("metadata oob")
        if (first) {
          if (typ != 0 || len < 34) fail("STREAMINFO must be first")
          val o = p + 4
          rate = ((b(o + 10) & 0xffL) << 12) |
            ((b(o + 11) & 0xffL) << 4) | ((b(o + 12) & 0xf0L) >> 4)
          channels = ((b(o + 12) >> 1) & 0x07) + 1
          bps = (((b(o + 12) & 0x01) << 4) | ((b(o + 13) & 0xf0) >> 4)) + 1
          totalSamples = ((b(o + 13) & 0x0fL) << 32) |
            ((b(o + 14) & 0xffL) << 24) | ((b(o + 15) & 0xffL) << 16) |
            ((b(o + 16) & 0xffL) << 8) | (b(o + 17) & 0xffL)
          first = false
        }
        p += 4 + len
      }
      if (first || rate <= 0 || channels < 1 || channels > 8)
        fail("bad STREAMINFO")
      if (bps != 16) fail("only 16-bit streams supported")
      if (totalSamples * channels > MaxSamples) fail("stream too long")

      val samples = new scala.collection.mutable.ArrayBuilder.ofInt
      var decoded = 0L
      while (p < b.length) {
        val (frame, nextP) = decodeFrame(b, p, channels, rate)
        val bs = frame(0).length
        var i = 0
        while (i < bs) {
          var c = 0
          while (c < channels) {
            val s = frame(c)(i)
            if (s < -32768 || s > 32767) fail("sample out of range")
            samples += s
            c += 1
          }
          i += 1
        }
        decoded += bs
        if (decoded * channels > MaxSamples) fail("decode bomb")
        p = nextP
      }
      if (totalSamples > 0 && decoded != totalSamples)
        fail("sample count mismatch")
      Some((samples.result(), channels, rate))
    } catch {
      case FlacFail(_) => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** One frame: per-channel sample arrays + next byte offset. */
  private def decodeFrame(b: Array[Byte], start: Int, channels: Int,
      siRate: Long): (Array[Array[Int]], Int) = {
    val r = new BitReader(b, start)
    if (r.readBits(14) != 0x3ffe) fail("bad sync")
    r.readBit() // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readBits(4).toInt
    val rateCode = r.readBits(4).toInt
    val chanCode = r.readBits(4).toInt
    val sizeCode = r.readBits(3).toInt
    if (r.readBit() != 0) fail("reserved bit set")
    // UTF-8-coded frame/sample number: parse and discard
    val lead = r.readBits(8).toInt
    val extra =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else fail("bad frame number coding")
    var e = 0
    while (e < extra) {
      if ((r.readBits(8).toInt & 0xc0) != 0x80)
        fail("bad frame number continuation")
      e += 1
    }
    val blockSize = bsCode match {
      case 0 => fail("reserved blocksize code")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    rateCode match {
      case 0 => () // from STREAMINFO
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => fail("invalid rate code")
      case _ => ()
    }
    val bps = sizeCode match {
      case 4 => 16
      case _ => fail("only 16-bit frames supported")
    }
    val (nCh, mode) = chanCode match {
      case n if n <= 7 => (n + 1, 0)
      case 8 => (2, 1) // left/side
      case 9 => (2, 2) // right/side
      case 10 => (2, 3) // mid/side
      case _ => fail("reserved channel assignment")
    }
    if (nCh != channels) fail("channel count mismatch")
    // header CRC-8: everything from sync through the byte before it
    r.alignByte()
    val crcPos = r.position
    if (crc8(b, start, crcPos) != r.readBits(8).toInt)
      fail("frame header crc8")
    if (blockSize <= 0 || blockSize > 65536) fail("bad blocksize")

    val chans = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      // side channel carries one extra bit
      val sbps = mode match {
        case 1 if c == 1 => bps + 1
        case 2 if c == 0 => bps + 1
        case 3 if c == 1 => bps + 1
        case _ => bps
      }
      chans(c) = decodeSubframe(r, blockSize, sbps)
      c += 1
    }
    // inter-channel reconstruction
    mode match {
      case 1 => // left/side: right = left - side
        val l = chans(0); val s = chans(1)
        val rt = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) { rt(i) = l(i) - s(i); i += 1 }
        chans(1) = rt
      case 2 => // right/side: left = right + side
        val s = chans(0); val rt = chans(1)
        val l = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) { l(i) = rt(i) + s(i); i += 1 }
        chans(0) = l; chans(1) = rt
      case 3 => // mid/side
        val m = chans(0); val s = chans(1)
        val l = new Array[Int](blockSize)
        val rt = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) {
          val m2 = (m(i) << 1) | (s(i) & 1)
          l(i) = (m2 + s(i)) >> 1
          rt(i) = (m2 - s(i)) >> 1
          i += 1
        }
        chans(0) = l; chans(1) = rt
      case _ => ()
    }
    // frame CRC-16 over everything incl. padding, big-endian footer
    r.alignByte()
    val endPos = r.position
    val want = crc16(b, start, endPos)
    val got = ((b(endPos) & 0xff) << 8) | (b(endPos + 1) & 0xff)
    if (want != got) fail("frame crc16")
    (chans, endPos + 2)
  }

  private def decodeSubframe(r: BitReader, bs: Int, bps: Int)
      : Array[Int] = {
    if (r.readBit() != 0) fail("subframe pad bit")
    val typ = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 32) fail("wasted bits exhaust bps")
    val out: Array[Int] = typ match {
      case 0 => // CONSTANT
        val v = r.readSigned(ebps)
        Array.fill(bs)(v)
      case 1 => // VERBATIM
        val a = new Array[Int](bs)
        var i = 0
        while (i < bs) { a(i) = r.readSigned(ebps); i += 1 }
        a
      case t if t >= 8 && t <= 12 => // FIXED, order = t - 8
        val order = t - 8
        if (order > bs) fail("order exceeds blocksize")
        val a = new Array[Int](bs)
        var i = 0
        while (i < order) { a(i) = r.readSigned(ebps); i += 1 }
        readResidual(r, bs, order, a)
        i = order
        while (i < bs) {
          val p = order match {
            case 0 => 0L
            case 1 => a(i - 1).toLong
            case 2 => 2L * a(i - 1) - a(i - 2)
            case 3 => 3L * a(i - 1) - 3L * a(i - 2) + a(i - 3)
            case _ => 4L * a(i - 1) - 6L * a(i - 2) +
              4L * a(i - 3) - a(i - 4)
          }
          val v = p + a(i)
          if (v < Int.MinValue || v > Int.MaxValue)
            fail("fixed predictor overflow")
          a(i) = v.toInt
          i += 1
        }
        a
      case t if t >= 32 => // LPC, order = (t & 31) + 1
        val order = (t & 31) + 1
        if (order > bs) fail("order exceeds blocksize")
        val a = new Array[Int](bs)
        var i = 0
        while (i < order) { a(i) = r.readSigned(ebps); i += 1 }
        val precM1 = r.readBits(4).toInt
        if (precM1 == 15) fail("invalid qlp precision")
        val precision = precM1 + 1
        val shift = r.readSigned(5)
        if (shift < 0) fail("negative qlp shift")
        val coefs = new Array[Int](order)
        var j = 0
        while (j < order) { coefs(j) = r.readSigned(precision); j += 1 }
        readResidual(r, bs, order, a)
        i = order
        while (i < bs) {
          var acc = 0L
          j = 0
          while (j < order) { acc += coefs(j).toLong * a(i - 1 - j); j += 1 }
          val v = (acc >> shift) + a(i)
          if (v < Int.MinValue || v > Int.MaxValue)
            fail("lpc overflow")
          a(i) = v.toInt
          i += 1
        }
        a
      case _ => fail(s"reserved subframe type $typ")
    }
    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Partitioned Rice residual into `a(order until bs)`. */
  private def readResidual(r: BitReader, bs: Int, order: Int,
      a: Array[Int]): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) fail("reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (bs % nParts != 0) fail("partition misalignment")
    val partLen = bs / nParts
    if (partLen <= order && nParts == 1) fail("empty first partition")
    var idx = order
    var part = 0
    while (part < nParts) {
      val n = if (part == 0) partLen - order else partLen
      if (n < 0) fail("negative partition")
      val param = r.readBits(paramBits).toInt
      var i = 0
      if (param == escape) {
        val raw = r.readBits(5).toInt
        while (i < n) { a(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        while (i < n) {
          val q = r.readUnary()
          val rem = r.readBits(param)
          val u = (q.toLong << param) | rem
          a(idx) = ((u >> 1) ^ -(u & 1L)).toInt // unzigzag
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  // ------------------------------------------------------------------
  // encoder (fixture side) — real compressed frames so the oracle
  // faces the full decode chain
  // ------------------------------------------------------------------

  private def utf8FrameNumber(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.writeBits(n, 8)
    else if (n < 0x800) {
      w.writeBits(0xc0L | (n >> 6), 8)
      w.writeBits(0x80L | (n & 0x3f), 8)
    } else if (n < 0x10000) {
      w.writeBits(0xe0L | (n >> 12), 8)
      w.writeBits(0x80L | ((n >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (n & 0x3f), 8)
    } else {
      w.writeBits(0xf0L | (n >> 18), 8)
      w.writeBits(0x80L | ((n >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((n >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (n & 0x3f), 8)
    }
  }

  private def zigzag(v: Int): Long = (v.toLong << 1) ^ (v >> 31)

  /** Best single Rice parameter for a partition (exact cost scan). */
  private def bestRiceParam(res: Array[Int], from: Int, until: Int)
      : Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 30) {
      var cost = 0L
      var i = from
      while (i < until) {
        cost += (zigzag(res(i)) >> p) + 1 + p
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; best = p }
      p += 1
    }
    best
  }

  private def writeResidual(w: BitWriter, res: Array[Int], order: Int,
      bs: Int, partOrder: Int, escapeRaw: Boolean): Unit = {
    w.writeBits(1, 2) // method 1: 5-bit params
    w.writeBits(partOrder.toLong, 4)
    val nParts = 1 << partOrder
    val partLen = bs / nParts
    var part = 0
    var idx = 0
    while (part < nParts) {
      val n = if (part == 0) partLen - order else partLen
      if (escapeRaw) {
        var maxBits = 1
        var i = idx
        while (i < idx + n) {
          val v = res(i)
          val need = 33 - java.lang.Integer.numberOfLeadingZeros(
            if (v < 0) ~v else v)
          if (need > maxBits) maxBits = need
          i += 1
        }
        w.writeBits(31, 5) // escape
        w.writeBits(maxBits.toLong, 5)
        i = idx
        while (i < idx + n) { w.writeSigned(res(i), maxBits); i += 1 }
      } else {
        val param = math.min(30, bestRiceParam(res, idx, idx + n))
        w.writeBits(param.toLong, 5)
        var i = idx
        while (i < idx + n) {
          val u = zigzag(res(i))
          w.writeUnary((u >> param).toInt)
          w.writeBits(u & ((1L << param) - 1), param)
          i += 1
        }
      }
      idx += n
      part += 1
    }
  }

  /** One subframe. `variant`: 0 verbatim, 1 fixed-2/rice, 2
    * fixed-1/rice(part order 1), 3 lpc-2/rice, 4 fixed-0/escape-raw;
    * constant streams always encode CONSTANT.
    */
  private def writeSubframe(w: BitWriter, s: Array[Int], bps: Int,
      variant: Int): Unit = {
    val bs = s.length
    w.writeBit(0)
    val allEqual = bs > 0 && s.forall(_ == s(0))
    if (allEqual) {
      w.writeBits(0, 6); w.writeBit(0) // CONSTANT, no wasted bits
      w.writeSigned(s(0), bps)
      return
    }
    val v = if (bs < 8) 0 else variant
    v match {
      case 1 | 2 =>
        val order = if (v == 1) 2 else 1
        val partOrder = if (v == 2 && bs % 2 == 0 && bs / 2 > order) 1
          else 0
        w.writeBits((8 + order).toLong, 6); w.writeBit(0)
        var i = 0
        while (i < order) { w.writeSigned(s(i), bps); i += 1 }
        val res = new Array[Int](bs)
        i = order
        while (i < bs) {
          val p = if (order == 1) s(i - 1).toLong
                  else 2L * s(i - 1) - s(i - 2)
          res(i - order) = (s(i) - p).toInt
          i += 1
        }
        writeResidual(w, java.util.Arrays.copyOf(res, bs - order),
          order, bs, partOrder, escapeRaw = false)
      case 3 =>
        val order = 2
        val shift = 5
        val coefs = Array(45, -14) // arbitrary fixed quantized pair
        w.writeBits((32 + order - 1).toLong, 6); w.writeBit(0)
        var i = 0
        while (i < order) { w.writeSigned(s(i), bps); i += 1 }
        w.writeBits(14, 4) // precision 15 bits
        w.writeSigned(shift, 5)
        for (c <- coefs) w.writeSigned(c, 15)
        val res = new Array[Int](bs - order)
        i = order
        while (i < bs) {
          val acc = coefs(0).toLong * s(i - 1) +
            coefs(1).toLong * s(i - 2)
          res(i - order) = (s(i) - (acc >> shift)).toInt
          i += 1
        }
        writeResidual(w, res, order, bs, 0, escapeRaw = false)
      case 4 =>
        w.writeBits(8, 6); w.writeBit(0) // FIXED order 0
        writeResidual(w, s.clone(), 0, bs, 0, escapeRaw = true)
      case _ =>
        w.writeBits(1, 6); w.writeBit(0) // VERBATIM
        var i = 0
        while (i < bs) { w.writeSigned(s(i), bps); i += 1 }
    }
  }

  /** Real FLAC encoder for fixtures: 16-bit interleaved samples →
    * fLaC stream. `variant` picks the subframe coding (see
    * [[writeSubframe]]), `chanMode` the stereo decorrelation
    * (0 independent, 1 left/side, 2 right/side, 3 mid/side — stereo
    * only), `blockSize` the fixed frame size.
    */
  def encode(samples: Array[Int], channels: Int, rate: Long,
      variant: Int, chanMode: Int, blockSize: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels 1-8")
    require(samples.length % channels == 0, "ragged interleave")
    require(blockSize >= 8 && blockSize <= 65536, "blockSize 8-65536")
    val nFrames0 = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    // fLaC + STREAMINFO (last-metadata flag set)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BitWriter
    si.writeBits(1, 1); si.writeBits(0, 7) // last, type 0
    si.writeBits(34, 24)
    si.writeBits(blockSize.toLong, 16) // min block
    si.writeBits(blockSize.toLong, 16) // max block
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(rate, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15, 5) // bps - 1 = 15
    si.writeBits(nFrames0.toLong, 36)
    for (_ <- 0 until 16) si.writeBits(0, 8) // md5 unset
    val sib = si.toBytes
    out.write(sib, 0, sib.length)

    var frameNo = 0L
    var off = 0
    while (off < nFrames0) {
      val useBs = math.min(blockSize, nFrames0 - off)
      // de-interleave this block
      val chans = Array.ofDim[Int](channels, useBs)
      var i = 0
      while (i < useBs) {
        var c = 0
        while (c < channels) {
          chans(c)(i) = samples((off + i) * channels + c)
          c += 1
        }
        i += 1
      }
      val mode = if (channels == 2) chanMode & 3 else 0
      val (enc0, enc1bps) = mode match {
        case 1 =>
          val s = new Array[Int](useBs)
          i = 0
          while (i < useBs) { s(i) = chans(0)(i) - chans(1)(i); i += 1 }
          (Array(chans(0), s), Array(16, 17))
        case 2 =>
          val s = new Array[Int](useBs)
          i = 0
          while (i < useBs) { s(i) = chans(0)(i) - chans(1)(i); i += 1 }
          (Array(s, chans(1)), Array(17, 16))
        case 3 =>
          val m = new Array[Int](useBs)
          val s = new Array[Int](useBs)
          i = 0
          while (i < useBs) {
            m(i) = (chans(0)(i) + chans(1)(i)) >> 1
            s(i) = chans(0)(i) - chans(1)(i)
            i += 1
          }
          (Array(m, s), Array(16, 17))
        case _ => (chans, Array.fill(channels)(16))
      }
      val chanCode = mode match {
        case 1 => 8; case 2 => 9; case 3 => 10
        case _ => channels - 1
      }
      val w = new BitWriter
      w.writeBits(0x3ffe, 14)
      w.writeBit(0); w.writeBit(0) // reserved, fixed-blocksize
      w.writeBits(7, 4) // blocksize: 16-bit at end of header
      w.writeBits(0, 4) // rate: from STREAMINFO
      w.writeBits(chanCode.toLong, 4)
      w.writeBits(4, 3) // sample size: 16-bit
      w.writeBit(0)
      utf8FrameNumber(w, frameNo)
      w.writeBits((useBs - 1).toLong, 16)
      val hdr = w.toBytes
      val withCrc8 = hdr :+ crc8(hdr, 0, hdr.length).toByte
      val body = new BitWriter
      var c = 0
      while (c < enc0.length) {
        writeSubframe(body, enc0(c), enc1bps(c), variant)
        c += 1
      }
      val bodyBytes = body.toBytes
      val frame = withCrc8 ++ bodyBytes
      val c16 = crc16(frame, 0, frame.length)
      out.write(frame, 0, frame.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      frameNo += 1
      off += useBs
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // signature + Spark plumbing
  // ------------------------------------------------------------------

  /** The windowed-energy signature over DECODED FLAC PCM — same
    * arithmetic as the WAV path ([[Multimodal.signatureFromPcm]]),
    * so a WAV original and its FLAC re-encode sign identically and
    * `audioDupPairs` pairs them.
    */
  def flacAudioSignature(b: Array[Byte]): Option[Long] =
    decodePcm16(b).map { case (samples, _, _) =>
      Multimodal.signatureFromPcm(samples)
    }

  val flacSignatureSchema: StructType = StructType(Seq(
    StructField("audio_sig", LongType)))

  /** Decode kernel for `Multimodal.decodeBatches`. */
  def decodeFlacSignature(bytes: Array[Byte]): Seq[Any] =
    flacAudioSignature(bytes) match {
      case Some(x) => Seq[Any](x)
      case None    => Seq[Any](null)
    }

  /** Container-agnostic signature: WAV or FLAC by magic. */
  def audioSignatureAny(b: Array[Byte]): Option[Long] =
    if (b != null && b.length >= 4 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C') flacAudioSignature(b)
    else Multimodal.wavAudioSignature(b)

  def decodeAudioSignatureAny(bytes: Array[Byte]): Seq[Any] =
    audioSignatureAny(bytes) match {
      case Some(x) => Seq[Any](x)
      case None    => Seq[Any](null)
    }

  /** Per-row FLAC synthesizer with the SAME planted LCG samples as
    * the WAV fixtures: s(i) = ((doc_id·7919 + i·104729) % 65536) −
    * 32768 over interleaved index i, frames/channels/rate from the
    * given int columns — so the q_audio_signature oracle arithmetic
    * transfers verbatim. `variantCol`/`modeCol` cycle the subframe
    * coding and stereo decorrelation.
    */
  def synthFlacs(df: DataFrame, idCol: String, framesCol: String,
      chCol: String, rateCol: String, variantCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, fi, ci, ri, vi, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(framesCol), df.schema.fieldIndex(chCol),
      df.schema.fieldIndex(rateCol), df.schema.fieldIndex(variantCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(ii)
        val frames = r.getInt(fi)
        val ch = r.getInt(ci)
        val rate = r.getInt(ri).toLong
        val n = frames * ch
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            (((id * 7919 + i.toLong * 104729) % 65536).toInt - 32768)
          i += 1
        }
        val bytes = encode(samples, ch, rate, r.getInt(vi),
          r.getInt(mi), blockSize = 64)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
