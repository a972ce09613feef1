package graft.operators

/** Real WebP-lossless (VP8L) codec — no external libraries, the same
  * contract as the PNG/JPEG/GIF codecs in [[Multimodal]]: decode to
  * an ARGB plane (then luma), classify malformed/unsupported content
  * as None, never throw into a task.
  *
  * Decoder coverage (RFC 9649): RIFF/WEBP container walk to the VP8L
  * chunk; LSB-first bit reading; canonical prefix codes in both forms
  * (simple 1–2 symbol and code-length-coded with 16/17/18 repeats and
  * the max_symbol cut); the 0-bit single-symbol degenerate code; the
  * green/red/blue/alpha/distance five-code group; meta-prefix entropy
  * images; LZ77 backward references with the 120-entry 2D
  * neighborhood distance map; the color cache (0x1e35a7bd hash); and
  * ALL FOUR transforms applied in reverse read order — PREDICTOR (14
  * predictor modes, per-tile ids from a sub-image), COLOR (per-tile
  * signed 3.5-fixed-point cross-channel deltas), SUBTRACT_GREEN, and
  * COLOR_INDEXING (delta-coded palette incl. sub-byte pixel bundling
  * at widths 1/2/4). Lossy VP8 and animated/extended containers
  * classify as None (a different codec, honestly out of scope).
  *
  * Encoder (the fixture-synthesis side): three real VP8L layouts —
  * subtract-green with a flat 8-bit green code, predictor-transformed
  * (per-tile id sub-image + residual coding), and palettized with
  * pixel bundling — all bit-exact round-trips through the decoder,
  * so an analytic oracle can predict hashes of synthesized images
  * exactly like the PNG/JPEG/GIF checkers.
  */
object WebP {

  // ------------------------------------------------------------------
  // bit I/O (VP8L is LSB-first)
  // ------------------------------------------------------------------

  private object WebpFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BitReader(b: Array[Byte], start: Int,
      end: Int) {
    private var pos = start
    private var acc = 0L
    private var bits = 0
    def read(n: Int): Int = {
      while (bits < n) {
        if (pos >= end) throw WebpFail
        acc |= (b(pos) & 0xffL) << bits
        bits += 8; pos += 1
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n; bits -= n
      v
    }
    def bit(): Int = read(1)
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var bits = 0
    def put(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << bits
      bits += n
      while (bits >= 8) {
        buf.write((acc & 0xff).toInt)
        acc >>>= 8; bits -= 8
      }
    }
    def bytes: Array[Byte] = {
      if (bits > 0) { buf.write((acc & 0xff).toInt); acc = 0; bits = 0 }
      buf.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // canonical prefix codes
  // ------------------------------------------------------------------

  /** Tree-walk decoder built from canonical code lengths (codes
    * assigned shorter-first, then by symbol order — the DEFLATE/VP8L
    * convention); `lengths(i) == 0` = absent. A table with exactly
    * one used symbol decodes it with 0 bits read.
    */
  private final class Prefix(lengths: Array[Int]) {
    private val used = lengths.count(_ > 0)
    private val single = if (used == 1) lengths.indexWhere(_ > 0) else -1
    // binary tree as arrays: node -> (left, right); leaves negative
    private val left = Array.fill(math.max(2 * used, 2))(0)
    private val right = Array.fill(math.max(2 * used, 2))(0)
    private var nNodes = 1
    if (used == 0) throw WebpFail
    if (single < 0) {
      val maxLen = lengths.max
      var code = 0
      var kraft = 0L
      for (len <- 1 to maxLen) {
        for (sym <- lengths.indices if lengths(sym) == len) {
          // insert MSB-first path of `code` (len bits)
          var node = 0
          var d = len - 1
          while (d > 0) {
            val bit = (code >> d) & 1
            val nxt = if (bit == 0) left(node) else right(node)
            if (nxt < 0) throw WebpFail // leaf where internal needed
            val child =
              if (nxt > 0) nxt
              else {
                val c = nNodes; nNodes += 1
                if (c >= left.length) throw WebpFail
                if (bit == 0) left(node) = c else right(node) = c
                c
              }
            node = child
            d -= 1
          }
          val bit = code & 1
          if ((if (bit == 0) left(node) else right(node)) != 0)
            throw WebpFail
          if (bit == 0) left(node) = -(sym + 1) else right(node) = -(sym + 1)
          code += 1
          kraft += 1L << (maxLen - len)
        }
        code <<= 1
      }
      if (kraft != (1L << maxLen)) throw WebpFail // incomplete code
    }
    def decode(r: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val nxt = if (r.bit() == 0) left(node) else right(node)
        if (nxt < 0) return -nxt - 1
        if (nxt == 0) throw WebpFail
        node = nxt
      }
      -1
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
      14, 15)

  /** One prefix code from the stream (simple or code-length-coded). */
  private def readCode(r: BitReader, alphabetSize: Int): Prefix = {
    val lengths = new Array[Int](alphabetSize)
    if (r.bit() == 1) { // simple
      val nSym = r.bit() + 1
      val first =
        if (r.bit() == 1) r.read(8) else r.read(1)
      if (first >= alphabetSize) throw WebpFail
      lengths(first) = 1
      if (nSym == 2) {
        val second = r.read(8)
        if (second >= alphabetSize || second == first) throw WebpFail
        lengths(second) = 1
      }
      // single-symbol simple code is the 0-bit degenerate decoder
      if (nSym == 1) lengths(first) = 1 // Prefix handles used==1
      new Prefix(lengths)
    } else {
      val clLengths = new Array[Int](19)
      val numCl = 4 + r.read(4)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = r.read(3); i += 1 }
      val cl = new Prefix(clLengths)
      var maxSymbol =
        if (r.bit() == 1) {
          val nb = 2 + 2 * r.read(3)
          2 + r.read(nb)
        } else alphabetSize
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize) {
        if (maxSymbol == 0) {
          sym = alphabetSize // rest are zero
        } else {
          maxSymbol -= 1
          val c = cl.decode(r)
          if (c < 16) {
            lengths(sym) = c; sym += 1
            if (c != 0) prevLen = c
          } else if (c == 16) {
            val rep = 3 + r.read(2)
            var k = 0
            while (k < rep && sym < alphabetSize) {
              lengths(sym) = prevLen; sym += 1; k += 1
            }
          } else if (c == 17) {
            sym += 3 + r.read(3)
          } else { // 18
            sym += 11 + r.read(7)
          }
          if (sym > alphabetSize) throw WebpFail
        }
      }
      new Prefix(lengths)
    }
  }

  // ------------------------------------------------------------------
  // LZ77 prefix values + distance neighborhood
  // ------------------------------------------------------------------

  private def lz77Value(r: BitReader, prefixCode: Int): Int = {
    if (prefixCode < 4) return prefixCode + 1
    val extra = (prefixCode - 2) >> 1
    val offset = (2 + (prefixCode & 1)) << extra
    offset + r.read(extra) + 1
  }

  // (xOffset, yOffset) pairs, RFC 9649 §5.2.2 — code 1..120
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def mapDistance(code: Int, w: Int): Int = {
    if (code > 120) return code - 120
    val (dx, dy) = DistMap(code - 1)
    val d = dx + dy * w
    if (d < 1) 1 else d
  }

  // ------------------------------------------------------------------
  // transforms
  // ------------------------------------------------------------------

  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], extra: Int)

  private def avg2(a: Int, b: Int): Int = {
    // per-channel average of two ARGB pixels
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= (((a >>> sh) + (b >>> sh)) & 0xff) << sh
      sh += 8
    }
    out
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val pred = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pl += math.abs(pred - ch(l, sh))
      pt += math.abs(pred - ch(t, sh))
      sh += 8
    }
    if (pl <= pt) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      val v = clamp255(a + (a - b) / 2)
      out |= v << sh
      sh += 8
    }
    out
  }

  /** Predicted pixel for mode 0..13 given already-final neighbors.
    * Shared by decoder (inverse) and encoder (forward residuals), so
    * round-trips are self-consistent by construction. Edge handling
    * is the caller's (row 0 → L-predict, col 0 → T-predict, (0,0) →
    * black).
    */
  private def predict(mode: Int, l: Int, t: Int, tr: Int,
      tl: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(l, t, tl)
    case _ => throw WebpFail
  }

  private def inversePredictor(pix: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int], tw: Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) pix(i - 1) // L
          else if (x == 0) pix(i - w) // T
          else {
            val mode = (tiles((y >> bits) * tw + (x >> bits)) >>> 8) &
              0xff
            // TR at the rightmost column wraps to the CURRENT row's
            // leftmost pixel — the natural flat-array read, which is
            // exactly the spec's addressing
            predict(mode, pix(i - 1), pix(i - w), pix(i - w + 1),
              pix(i - w - 1))
          }
        pix(i) = addPixels(pix(i), pred)
        x += 1
      }
      y += 1
    }
  }

  private def cDelta(t: Int, c: Int): Int =
    ((t.toByte.toInt * c.toByte.toInt) >> 5)

  private def inverseColor(pix: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int], tw: Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val cte = tiles((y >> bits) * tw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >>> 8) & 0xff
        val r2b = (cte >>> 16) & 0xff
        val p = pix(i)
        val g = (p >>> 8) & 0xff
        var r = (p >>> 16) & 0xff
        var b = p & 0xff
        r = (r + cDelta(g2r, g)) & 0xff
        b = (b + cDelta(g2b, g) + cDelta(r2b, r)) & 0xff
        pix(i) = (p & 0xff00ff00.toInt) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(pix: Array[Int]): Unit = {
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      pix(i) = (p & 0xff00ff00.toInt) | (r << 16) | b
      i += 1
    }
  }

  private[operators] def paletteBits(size: Int): Int =
    if (size <= 2) 3 // 8 px/byte -> shift 3
    else if (size <= 4) 2
    else if (size <= 16) 1
    else 0

  private def inverseColorIndex(packed: Array[Int], w: Int, h: Int,
      palette: Array[Int]): Array[Int] = {
    val shift = paletteBits(palette.length)
    if (shift == 0) {
      val out = new Array[Int](w * h)
      var i = 0
      while (i < out.length) {
        val idx = (packed(i) >>> 8) & 0xff
        out(i) = if (idx < palette.length) palette(idx) else 0
        i += 1
      }
      return out
    }
    val ppb = 1 << shift        // pixels per packed byte
    val bitsPer = 8 >> shift
    val pw = (w + ppb - 1) >> shift
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (packed(y * pw + (x >> shift)) >>> 8) & 0xff
        val idx = (g >> ((x & (ppb - 1)) * bitsPer)) &
          ((1 << bitsPer) - 1)
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // decoder
  // ------------------------------------------------------------------

  private def cacheHash(p: Int, bits: Int): Int =
    ((p * 0x1e35a7bd) >>> (32 - bits))

  /** One spatially-coded image (entropy-coded ARGB + optional color
    * cache + optional meta-prefix groups). `topLevel` gates the
    * meta-prefix bit (sub-images always have one group).
    */
  private def decodeEntropyImage(r: BitReader, w: Int, h: Int,
      topLevel: Boolean): Array[Int] = {
    // color cache
    val cacheBits = if (r.bit() == 1) r.read(4) else 0
    if (cacheBits > 11) throw WebpFail
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix groups
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (topLevel && r.bit() == 1) {
      metaBits = r.read(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      meta = decodeEntropyImage(r, metaW, metaH, topLevel = false)
      var mx = 0
      var i = 0
      while (i < meta.length) {
        val idx = (((meta(i) >>> 16) & 0xff) << 8) |
          ((meta(i) >>> 8) & 0xff) // (red << 8) | green
        if (idx > mx) mx = idx
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 4096) throw WebpFail
    }
    val greenSize = 256 + 24 + cacheSize
    val codes = Array.ofDim[Prefix](nGroups, 5)
    var gI = 0
    while (gI < nGroups) {
      codes(gI)(0) = readCode(r, greenSize)
      codes(gI)(1) = readCode(r, 256)
      codes(gI)(2) = readCode(r, 256)
      codes(gI)(3) = readCode(r, 256)
      codes(gI)(4) = readCode(r, 40)
      gI += 1
    }
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cachePush(p: Int): Unit =
      if (cache != null) cache(cacheHash(p, cacheBits)) = p
    val pix = new Array[Int](w * h)
    var pos = 0
    while (pos < pix.length) {
      val grp =
        if (meta == null) codes(0)
        else {
          val x = pos % w; val y = pos / w
          val m = meta((y >> metaBits) * metaW + (x >> metaBits))
          val idx = (((m >>> 16) & 0xff) << 8) | ((m >>> 8) & 0xff)
          codes(idx)
        }
      val g = grp(0).decode(r)
      if (g < 256) {
        val red = grp(1).decode(r)
        val blue = grp(2).decode(r)
        val alpha = grp(3).decode(r)
        val p = (alpha << 24) | (red << 16) | (g << 8) | blue
        pix(pos) = p
        cachePush(p)
        pos += 1
      } else if (g < 280) {
        val len = lz77Value(r, g - 256)
        val distCode = lz77Value(r, grp(4).decode(r))
        val dist = mapDistance(distCode, w)
        if (dist > pos || pos + len > pix.length) throw WebpFail
        var k = 0
        while (k < len) {
          pix(pos) = pix(pos - dist)
          cachePush(pix(pos))
          pos += 1; k += 1
        }
      } else {
        if (cache == null) throw WebpFail
        val idx = g - 280
        if (idx >= cacheSize) throw WebpFail
        pix(pos) = cache(idx)
        pos += 1
      }
    }
    pix
  }

  /** Full VP8L payload decode (after the 0x2f signature byte). */
  private def decodeVp8l(b: Array[Byte], off: Int, end: Int)
      : (Int, Int, Array[Int]) = {
    val r = new BitReader(b, off, end)
    val w = r.read(14) + 1
    val h = r.read(14) + 1
    r.bit() // alpha hint
    if (r.read(3) != 0) throw WebpFail // version
    if (w.toLong * h > 67108864L) throw WebpFail
    // transforms (top level only, each type at most once)
    var transforms = List.empty[Transform]
    var curW = w
    var seen = 0
    while (r.bit() == 1) {
      val kind = r.read(2)
      if ((seen & (1 << kind)) != 0 || transforms.length >= 4)
        throw WebpFail
      seen |= 1 << kind
      kind match {
        case 0 | 1 => // predictor / color: per-tile sub-image
          val bits = r.read(3) + 2
          val tw = (curW + (1 << bits) - 1) >> bits
          val th = (h + (1 << bits) - 1) >> bits
          val tiles = decodeEntropyImage(r, tw, th, topLevel = false)
          transforms ::= Transform(kind, bits, tiles, tw)
        case 2 =>
          transforms ::= Transform(2, 0, null, 0)
        case 3 =>
          val size = r.read(8) + 1
          val deltas = decodeEntropyImage(r, size, 1, topLevel = false)
          val palette = new Array[Int](size)
          var prev = 0
          var i = 0
          while (i < size) {
            palette(i) = addPixels(deltas(i), prev)
            prev = palette(i)
            i += 1
          }
          val shift = paletteBits(size)
          curW = if (shift == 0) curW
            else (curW + (1 << shift) - 1) >> shift
          transforms ::= Transform(3, 0, palette, 0)
      }
    }
    var pix = decodeEntropyImage(r, curW, h, topLevel = true)
    var width = curW
    // inverse transforms in reverse read order (list head = last read)
    for (t <- transforms) t.kind match {
      case 0 => inversePredictor(pix, width, h, t.bits, t.data, t.extra)
      case 1 => inverseColor(pix, width, h, t.bits, t.data, t.extra)
      case 2 => inverseSubtractGreen(pix)
      case 3 =>
        pix = inverseColorIndex(pix, w, h, t.data)
        width = w
    }
    if (width != w) throw WebpFail
    (w, h, pix)
  }

  /** Decode a WebP container to (width, height, ARGB pixels): walks
    * RIFF/WEBP chunks to VP8L. Lossy VP8 / extended VP8X containers,
    * truncation and corrupt streams classify as None.
    */
  def decodeArgb(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 20) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    try {
      var p = 12
      while (p + 8 <= b.length) {
        val tag = new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)),
          "US-ASCII")
        val len = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
          ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
        if (len > Int.MaxValue || p + 8 + len > b.length) return None
        if (tag == "VP8L") {
          if (len < 2 || (b(p + 8) & 0xff) != 0x2f) return None
          return Some(decodeVp8l(b, p + 9, p + 8 + len.toInt))
        }
        p += 8 + len.toInt + (len.toInt & 1) // chunks are 2-padded
      }
      None
    } catch {
      case WebpFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Decode to the shared luma contract (BT.601 integer weights on
    * the ARGB plane, alpha ignored — hash inputs, same as PNG/JPEG).
    */
  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeArgb(b).map { case (w, h, argb) =>
      val luma = new Array[Int](argb.length)
      var i = 0
      while (i < argb.length) {
        val p = argb(i)
        luma(i) = (77 * ((p >>> 16) & 0xff) + 150 * ((p >>> 8) & 0xff) +
          29 * (p & 0xff) + 128) >> 8
        i += 1
      }
      (w, h, luma)
    }.orElse {
      // lossy frames: the full RFC 6386 pixel decode ([[Vp8]]) — the
      // Y plane IS the luma, no color conversion needed, which makes
      // the majority class of real .webp crawl payloads visible to
      // image near-dup at last
      Vp8.decodeYuv(b).map { case (w, h, y, _, _) =>
        val luma = new Array[Int](w * h)
        var i = 0
        while (i < luma.length) { luma(i) = y(i) & 0xff; i += 1 }
        (w, h, luma)
      }
    }

  // ------------------------------------------------------------------
  // encoder (fixture synthesis)
  // ------------------------------------------------------------------

  /** Write one prefix code from explicit lengths: simple form when ≤2
    * used symbols all fit in 8 bits, else the code-length-coded form
    * (literal CL symbols + 17/18 zero runs, max_symbol cut).
    */
  private def writeCode(o: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.zipWithIndex.filter(_._1 > 0)
    require(used.nonEmpty, "empty code")
    if (used.length <= 2 && used.forall(_._2 < 256)) {
      o.put(1, 1) // simple
      o.put(used.length - 1, 1)
      val first = used(0)._2
      if (first <= 1) { o.put(0, 1); o.put(first, 1) }
      else { o.put(1, 1); o.put(first, 8) }
      if (used.length == 2) o.put(used(1)._2, 8)
      return
    }
    o.put(0, 1) // code-length-coded
    // CL lengths: give every distinct nonzero length + 17 + 18 a slot.
    // Assign CL code lengths by frequency-free flat scheme: all used
    // CL symbols get equal length L = ceil(log2(nUsed)) — make the
    // kraft sum complete by promoting the first (2^L - n) symbols one
    // bit shorter when n is not a power of two.
    val distinctLens = lengths.filter(_ > 0).distinct.sorted
    val clSyms = (distinctLens ++ Seq(0, 17, 18)).distinct.sorted
    val n = clSyms.length
    var bitsL = 1
    while ((1 << bitsL) < n) bitsL += 1
    val promote = (1 << bitsL) - n // this many get length bitsL-1
    val clLen = new Array[Int](19)
    for ((s, i) <- clSyms.zipWithIndex)
      clLen(s) = if (i < promote && bitsL > 1) bitsL - 1 else bitsL
    if (n == 1) clLen(clSyms.head) = 1
    // canonical codes for the CL table
    val clCode = canonical(clLen)
    // num_code_lengths: cover the largest used index in ClOrder
    val lastIdx = ClOrder.zipWithIndex
      .filter { case (s, _) => clLen(s) > 0 }
      .map(_._2).max
    val numCl = math.max(4, lastIdx + 1)
    o.put(numCl - 4, 4)
    var i = 0
    while (i < numCl) { o.put(clLen(ClOrder(i)), 3); i += 1 }
    // no max_symbol cut (its budget counts CL-symbol READS, which is
    // easy to get off by a run token): fill the WHOLE alphabet, zero
    // tails as 17/18 runs — the decoder's `symbol < alphabet` exit is
    // then exact
    o.put(0, 1)
    def putCl(sym: Int): Unit = {
      val (c, l) = clCode(sym)
      var d = l - 1
      while (d >= 0) { o.put((c >> d) & 1, 1); d -= 1 }
    }
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) { putCl(len); i += 1 }
      else {
        var run = 0
        val j = {
          var k = i
          while (k < lengths.length && lengths(k) == 0) k += 1
          k
        }
        run = j - i
        while (run >= 3) {
          if (run >= 11) {
            val take = math.min(run, 138)
            putCl(18); o.put(take - 11, 7)
            run -= take
          } else {
            putCl(17); o.put(run - 3, 3)
            run = 0
          }
        }
        while (run > 0) { putCl(0); run -= 1 }
        i = j
      }
    }
  }

  /** Canonical (code, length) per symbol — shorter first, then symbol
    * order; MSB-first code bits.
    */
  private def canonical(lengths: Array[Int]): Map[Int, (Int, Int)] = {
    val maxLen = lengths.max
    var code = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to maxLen) {
      for (sym <- lengths.indices if lengths(sym) == len) {
        m(sym) = (code, len)
        code += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private val Flat8Green: Array[Int] = {
    val l = new Array[Int](280)
    java.util.Arrays.fill(l, 0, 256, 8)
    l
  }
  private val Flat8: Array[Int] = Array.fill(256)(8)

  private def single(alphabet: Int, sym: Int): Array[Int] = {
    val l = new Array[Int](alphabet)
    l(sym) = 1
    l
  }

  private def putFlat8(o: BitWriter, v: Int): Unit = {
    // flat 8-bit canonical code: code == symbol, MSB-first
    var d = 7
    while (d >= 0) { o.put((v >> d) & 1, 1); d -= 1 }
  }

  private def container(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    val body = 1 + payload.length // signature + payload
    val padded = body + (body & 1)
    tag("RIFF"); le32(4 + 8 + padded); tag("WEBP")
    tag("VP8L"); le32(body)
    out.write(0x2f)
    out.write(payload, 0, payload.length)
    if ((body & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def header(o: BitWriter, w: Int, h: Int): Unit = {
    o.put(w - 1, 14); o.put(h - 1, 14)
    o.put(0, 1) // alpha hint
    o.put(0, 3) // version
  }

  /** Gray VP8L via SUBTRACT_GREEN: r/b store 0 after the transform,
    * so only the green (gray) channel costs bits (flat 8-bit code).
    */
  def encodeGraySubtractGreen(w: Int, h: Int,
      pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h)
    val o = new BitWriter
    header(o, w, h)
    o.put(1, 1); o.put(2, 2) // one transform: subtract green
    o.put(0, 1)              // end of transforms
    o.put(0, 1)              // no color cache
    o.put(0, 1)              // no meta prefix
    writeCode(o, Flat8Green)          // green
    writeCode(o, single(256, 0))      // red (0 after subtract-green)
    writeCode(o, single(256, 0))      // blue
    writeCode(o, single(256, 255))    // alpha
    writeCode(o, single(40, 0))       // distance (unused)
    var i = 0
    while (i < pix.length) { putFlat8(o, pix(i) & 0xff); i += 1 }
    container(o.bytes)
  }

  /** Gray VP8L via the PREDICTOR transform (one tile, fixed mode):
    * the per-tile id rides a real 1×1 sub-image and the main stream
    * codes residuals against the shared [[predict]] helper — gray
    * residuals keep r == g == b, so three flat codes carry them and
    * alpha stays a 1-symbol code.
    */
  def encodeGrayPredictor(w: Int, h: Int, pix: Array[Int],
      mode: Int = 2): Array[Byte] = {
    require(pix.length == w * h)
    require(mode >= 1 && mode <= 13)
    val o = new BitWriter
    header(o, w, h)
    o.put(1, 1); o.put(0, 2) // one transform: predictor
    o.put(7, 3)              // size_bits = 9 -> 512px tiles (1 tile)
    require(w <= 512 && h <= 512, "one-tile encoder")
    // tile sub-image (1x1): mode in the green channel
    o.put(0, 1) // no cache
    writeCode(o, single(256, mode))   // green = mode
    writeCode(o, single(256, 0))      // red
    writeCode(o, single(256, 0))      // blue
    writeCode(o, single(256, 255))    // alpha
    writeCode(o, single(40, 0))       // distance
    o.put(0, 1)              // end of transforms
    o.put(0, 1)              // no cache (main)
    o.put(0, 1)              // no meta prefix
    writeCode(o, Flat8Green)          // green residuals
    writeCode(o, Flat8)               // red residuals
    writeCode(o, Flat8)               // blue residuals
    writeCode(o, single(256, 0))      // alpha residual (always 0)
    writeCode(o, single(40, 0))       // distance
    // forward residuals against the final (already-written) pixels
    val fin = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val actual = 0xff000000 | (pix(i) << 16) | (pix(i) << 8) |
          pix(i)
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) fin(i - 1)
          else if (x == 0) fin(i - w)
          else predict(mode, fin(i - 1), fin(i - w),
            fin(i - w + 1), fin(i - w - 1))
        fin(i) = actual
        val rr = (((actual >>> 16) & 0xff) - ((pred >>> 16) & 0xff)) & 0xff
        val rg = (((actual >>> 8) & 0xff) - ((pred >>> 8) & 0xff)) & 0xff
        val rb = ((actual & 0xff) - (pred & 0xff)) & 0xff
        putFlat8(o, rg) // green first, then red, then blue
        putFlat8(o, rr)
        putFlat8(o, rb)
        x += 1
      }
      y += 1
    }
    container(o.bytes)
  }

  /** Gray VP8L via COLOR_INDEXING with pixel bundling: distinct gray
    * levels become a delta-coded palette and indices pack sub-byte
    * (4 px/byte at ≤4 colors etc.) — the decoder's bundling path.
    */
  def encodeGrayPalette(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h)
    val levels = pix.distinct.sorted
    require(levels.length <= 256, "palette encoder needs <=256 levels")
    val index = levels.zipWithIndex.toMap
    val o = new BitWriter
    header(o, w, h)
    o.put(1, 1); o.put(3, 2) // one transform: color indexing
    o.put(levels.length - 1, 8)
    // palette sub-image (size x 1), delta-coded ARGB
    o.put(0, 1) // no cache
    writeCode(o, Flat8Green)
    writeCode(o, Flat8)
    writeCode(o, Flat8)
    writeCode(o, Flat8)
    writeCode(o, single(40, 0))
    var prev = 0
    for (lv <- levels) {
      val argb = 0xff000000 | (lv << 16) | (lv << 8) | lv
      val dA = (((argb >>> 24) & 0xff) - ((prev >>> 24) & 0xff)) & 0xff
      val dR = (((argb >>> 16) & 0xff) - ((prev >>> 16) & 0xff)) & 0xff
      val dG = (((argb >>> 8) & 0xff) - ((prev >>> 8) & 0xff)) & 0xff
      val dB = ((argb & 0xff) - (prev & 0xff)) & 0xff
      putFlat8(o, dG); putFlat8(o, dR); putFlat8(o, dB); putFlat8(o, dA)
      prev = argb
    }
    o.put(0, 1) // end of transforms
    // main image at packed width
    val shift = paletteBits(levels.length)
    val ppb = 1 << shift
    val bitsPer = 8 >> shift
    val pw = if (shift == 0) w else (w + ppb - 1) >> shift
    o.put(0, 1) // no cache
    o.put(0, 1) // no meta prefix
    writeCode(o, Flat8Green)
    writeCode(o, single(256, 0))
    writeCode(o, single(256, 0))
    writeCode(o, single(256, 255))
    writeCode(o, single(40, 0))
    var y = 0
    while (y < h) {
      var px = 0
      while (px < pw) {
        var packed = 0
        var k = 0
        while (k < ppb) {
          val x = (px << shift) + k
          if (x < w)
            packed |= index(pix(y * w + x)) << (k * bitsPer)
          k += 1
        }
        putFlat8(o, packed)
        px += 1
      }
      y += 1
    }
    container(o.bytes)
  }

  // ------------------------------------------------------------------
  // lossy VP8 (RFC 6386) — frame HEADER metadata
  // ------------------------------------------------------------------
  //
  // The C166 honest-tables refusal is RESOLVED (round 15): the
  // normative tables were extracted from this machine's system
  // libwebp and golden-pinned, and [[Vp8]] now decodes keyframe
  // pixels bit-exactly against the reference decoder (Vp8Spec).
  // [[decodeLuma]] routes lossy frames there; this header parser
  // stays as the cheap metadata tier (q_vp8_meta) that never needs
  // full pixel work.

  /** Parsed VP8 key-frame header (all table-free fields). */
  final case class Vp8Meta(
      width: Int, height: Int, wScale: Int, hScale: Int,
      version: Int, showFrame: Boolean, firstPartSize: Int,
      colorSpace: Int, clamping: Int, segmentation: Boolean,
      filterType: Int, filterLevel: Int, sharpness: Int,
      nPartitions: Int, yAcQi: Int)

  /** RFC 6386 §7 boolean decoder — the table-free core. Reads past
    * the end return zero bits (the spec's implicit-zero tail).
    */
  private final class BoolDec(b: Array[Byte], start: Int,
      private val end: Int) {
    private var pos = start + 2
    private var range = 255
    private var value =
      (if (start < end) (b(start) & 0xff) << 8 else 0) |
        (if (start + 1 < end) b(start + 1) & 0xff else 0)
    private var bitCount = 0
    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) {
        ret = 1; range -= split; value -= bigSplit
      } else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          if (pos < end) { value |= b(pos) & 0xff; pos += 1 }
        }
      }
      ret
    }
    /** MSB-first n-bit literal at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** Flagged signed value: flag bit, then |v| and a sign bit. */
    def flaggedSigned(n: Int): Int =
      if (bool(128) == 0) 0
      else { val v = literal(n); if (bool(128) != 0) -v else v }
  }

  /** Boolean ENCODER (fixture side) — interval arithmetic with carry
    * propagation, flushed with 32 zero bits per the reference
    * encoder's stop sequence.
    */
  private final class BoolEnc {
    private val buf = scala.collection.mutable.ArrayBuffer[Int]()
    private var low = 0L
    private var range = 255
    private var count = -24
    def put(bit: Int, prob: Int = 128): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      var shift = 0
      while ((range << shift) < 128) shift += 1
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((low << (offset - 1)) & 0x80000000L) != 0) {
          // carry: bump the last non-0xFF byte, zero the tail
          var x = buf.length - 1
          while (x >= 0 && buf(x) == 0xff) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) += 1
        }
        buf += ((low >> (24 - offset)) & 0xff).toInt
        low = (low << offset) & 0xffffff
        shift = count
        count -= 8
      }
      low <<= shift
    }
    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      var i = 0
      while (i < 32) { put(0); i += 1 }
      buf.map(_.toByte).toArray
    }
  }

  /** Parse the VP8 key-frame header of a lossy WebP: the 10-byte
    * uncompressed prefix (frame tag, 9d012a start code, 14-bit dims
    * with 2-bit upscales) plus the table-free leading fields of the
    * boolean-coded first partition. Interframes, bad start codes,
    * truncation → None.
    */
  def vp8Meta(b: Array[Byte]): Option[Vp8Meta] = {
    if (b == null || b.length < 20) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    try {
      var p = 12
      while (p + 8 <= b.length) {
        val tag = new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)),
          "US-ASCII")
        val len = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
          ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
        if (len > Int.MaxValue || p + 8 + len > b.length) return None
        if (tag == "VP8 ") return vp8FrameMeta(b, p + 8, len.toInt)
        p += 8 + len.toInt + (len.toInt & 1)
      }
      None
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def vp8FrameMeta(b: Array[Byte], off: Int, len: Int)
      : Option[Vp8Meta] = {
    if (len < 10) return None
    val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val show = ((tag >> 4) & 1) != 0
    val firstPart = tag >> 5
    if (!keyFrame || version > 3) return None
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) return None
    val wRaw = (b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)
    val hRaw = (b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)
    val (w, ws) = (wRaw & 0x3fff, wRaw >> 14)
    val (h, hs) = (hRaw & 0x3fff, hRaw >> 14)
    if (w == 0 || h == 0) return None
    if (10 + firstPart > len) return None
    val d = new BoolDec(b, off + 10, off + 10 + firstPart)
    val colorSpace = d.bool(128)
    val clamping = d.bool(128)
    val seg = d.bool(128) != 0
    if (seg) {
      // parse-and-skip so later fields stay aligned
      val updateMap = d.bool(128)
      val updateData = d.bool(128)
      if (updateData != 0) {
        d.bool(128) // feature mode
        var i = 0
        while (i < 4) { d.flaggedSigned(7); i += 1 } // quantizer
        i = 0
        while (i < 4) { d.flaggedSigned(6); i += 1 } // loop filter
      }
      if (updateMap != 0) {
        var i = 0
        while (i < 3) {
          if (d.bool(128) != 0) d.literal(8)
          i += 1
        }
      }
    }
    val filterType = d.bool(128)
    val filterLevel = d.literal(6)
    val sharpness = d.literal(3)
    if (d.bool(128) != 0) { // loop filter adjustments enabled
      if (d.bool(128) != 0) { // delta update
        var i = 0
        while (i < 8) { d.flaggedSigned(6); i += 1 }
      }
    }
    val nPartLog2 = d.literal(2)
    val yAcQi = d.literal(7)
    Some(Vp8Meta(w, h, ws, hs, version, show, firstPart,
      colorSpace, clamping, seg, filterType, filterLevel, sharpness,
      1 << nPartLog2, yAcQi))
  }

  /** Fixture writer: a structurally real lossy-WebP key frame whose
    * table-free header fields are planted — the boolean-coded first
    * partition carries the real field sequence (segmentation off,
    * no filter deltas), then padding standing in for the macroblock
    * data our scope refuses to decode.
    */
  def vp8Write(w: Int, h: Int, yAcQi: Int, filterLevel: Int,
      sharpness: Int, nPartLog2: Int, version: Int): Array[Byte] = {
    val e = new BoolEnc
    e.put(0) // color space
    e.put(0) // clamping
    e.put(0) // segmentation disabled
    e.put(0) // filter type: normal
    e.literal(filterLevel & 0x3f, 6)
    e.literal(sharpness & 7, 3)
    e.put(0) // no loop-filter adjustments
    e.literal(nPartLog2 & 3, 2)
    e.literal(yAcQi & 0x7f, 7)
    // dequant deltas: all absent
    var i = 0
    while (i < 5) { e.put(0); i += 1 }
    e.put(1) // refresh entropy probs
    val header = e.bytes
    val pad = new Array[Byte](16) // fake residual data
    val firstPart = header.length + pad.length
    val extraParts = (1 << (nPartLog2 & 3)) - 1
    val frame = new java.io.ByteArrayOutputStream()
    val tag = (0) | ((version & 7) << 1) | (1 << 4) | (firstPart << 5)
    frame.write(tag & 0xff); frame.write((tag >> 8) & 0xff)
    frame.write((tag >> 16) & 0xff)
    frame.write(0x9d); frame.write(0x01); frame.write(0x2a)
    frame.write(w & 0xff); frame.write((w >> 8) & 0x3f)
    frame.write(h & 0xff); frame.write((h >> 8) & 0x3f)
    frame.write(header, 0, header.length)
    frame.write(pad, 0, pad.length)
    // per-partition 3-byte sizes + empty token partitions
    var j = 0
    while (j < extraParts) {
      frame.write(2); frame.write(0); frame.write(0)
      j += 1
    }
    j = 0
    while (j < extraParts) {
      frame.write(0); frame.write(0)
      j += 1
    }
    val payload = frame.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(4 + 8 + payload.length + (payload.length & 1))
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write(' ')
    w32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Round-trip gate for the boolean coder pair: encode `bits` with
    * `probs`, decode, return the decoded bits. Exposed for the spec's
    * randomized coder check.
    */
  private[operators] def boolCoderRoundTrip(bits: Array[Int],
      probs: Array[Int]): Array[Int] = {
    val e = new BoolEnc
    var i = 0
    while (i < bits.length) { e.put(bits(i), probs(i)); i += 1 }
    val bytes = e.bytes
    val d = new BoolDec(bytes, 0, bytes.length)
    Array.tabulate(bits.length)(k => d.bool(probs(k)))
  }

  /** Test hook: the same round trip reachable from the spec package. */
  def boolCoderCheck(bits: Array[Int], probs: Array[Int]): Array[Int] =
    boolCoderRoundTrip(bits, probs)

  import org.apache.spark.sql.types.{StructType, StructField,
    IntegerType, BooleanType, BinaryType}

  val vp8MetaSchema: StructType = StructType(Seq(
    StructField("vp8_width", IntegerType),
    StructField("vp8_height", IntegerType),
    StructField("vp8_version", IntegerType),
    StructField("first_part_size", IntegerType),
    StructField("filter_level", IntegerType),
    StructField("sharpness", IntegerType),
    StructField("n_partitions", IntegerType),
    StructField("y_ac_qi", IntegerType),
    StructField("segmentation", BooleanType)))

  /** Decode kernel for `Multimodal.decodeBatches`. */
  def decodeVp8Meta(bytes: Array[Byte]): Seq[Any] =
    vp8Meta(bytes) match {
      case Some(m) => Seq[Any](m.width, m.height, m.version,
        m.firstPartSize, m.filterLevel, m.sharpness, m.nPartitions,
        m.yAcQi, m.segmentation)
      case None => Seq[Any](null, null, null, null, null, null, null,
        null, null)
    }

  /** Per-row lossy-WebP fixture synthesizer (map-only). */
  def synthVp8(df: org.apache.spark.sql.DataFrame, wCol: String,
      hCol: String, qiCol: String, flCol: String, shCol: String,
      npCol: String, outCol: String)
      : org.apache.spark.sql.DataFrame = {
    val sch = df.schema
    val (wi, hi, qi, fi, si, ni) = (sch.fieldIndex(wCol),
      sch.fieldIndex(hCol), sch.fieldIndex(qiCol),
      sch.fieldIndex(flCol), sch.fieldIndex(shCol),
      sch.fieldIndex(npCol))
    val schema = StructType(sch.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = vp8Write(r.getInt(wi), r.getInt(hi), r.getInt(qi),
          r.getInt(fi), r.getInt(si), r.getInt(ni), 0)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
