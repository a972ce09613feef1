package graft.operators

/** Full lossy VP8 key-frame pixel decode (RFC 6386) — the gap the
  * curation engine carried since round 11: the majority of real
  * .webp crawl payloads are lossy, and without pixel decode they
  * were invisible to image near-dup. Covers the boolean decoder,
  * the complete first-partition header (segmentation, loop-filter
  * deltas, quantizer indices, coefficient-probability updates),
  * per-MB intra modes (16x16 and the 4x4 B_PRED tree with
  * kf context probs), token/residual decode across multiple
  * partitions, dequantization, the exact-integer inverse WHT+DCT,
  * all intra predictors, and the normal+simple loop filters.
  *
  * Normative-table provenance (the C166 honest-tables rule): the
  * four large empirical tables — default coefficient probs
  * [4][8][3][11], their update probs, the kf 4x4 mode probs
  * [10][10][9], and the dc/ac dequant lookups — are EXTRACTED from
  * this machine's system libwebp 1.2.4 (`.rodata` of
  * libwebp.so.7.1.5, anchored by spec-known rows and validated by
  * structure: dummy-128 band rows, monotone quant ramps, zero-free
  * probabilities) and pinned as resources, exactly the method the
  * brotli dictionary used. Every decode is then golden-pinned
  * bit-exactly against the SAME reference decoder's YUV output
  * (Vp8Spec) — a transcription error anywhere breaks the goldens.
  *
  * Scope: key frames (what a .webp still is). Interframes refuse.
  */
object Vp8 {

  // ------------------------------------------------------------------
  // tables
  // ------------------------------------------------------------------

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** [4][8][3][11] default token probs (flat). */
  private val CoeffProbs: Array[Byte] =
    resource("/vp8/coeff_probs.bin")
  /** [4][8][3][11] update probs (flat). */
  private val CoeffUpdate: Array[Byte] =
    resource("/vp8/coeff_update_probs.bin")
  /** [10][10][9] kf 4x4 mode probs (flat). */
  private val KfBModeProbs: Array[Byte] =
    resource("/vp8/kf_bmode_probs.bin")
  private val DcQ: Array[Int] =
    resource("/vp8/dc_qlookup.bin").map(_ & 0xff)
  private val AcQ: Array[Int] = {
    val b = resource("/vp8/ac_qlookup.bin")
    Array.tabulate(128)(i =>
      (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8))
  }
  require(CoeffProbs.length == 1056 && CoeffUpdate.length == 1056 &&
    KfBModeProbs.length == 900 && DcQ.length == 128 &&
    AcQ.length == 128)

  // RFC 6386 §13.5 / §8.2: small structural tables (tree shapes,
  // scan order, bands, category extras) — written from the spec
  private val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val Bands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // token tree (§13.2): leaves negative
  private val CoeffTree = Array(
    -11, 2, // dct_eob
    -0, 4, // DCT_0
    -1, 6, // DCT_1
    8, 12,
    -2, 10, // DCT_2
    -3, -4, // DCT_3, DCT_4
    14, 16,
    -5, -6, // cat1, cat2
    18, 20,
    -7, -8, // cat3, cat4
    -9, -10) // cat5, cat6
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)

  // intra mode enums: DC=0 V=1 H=2 TM=3 BPred=4 (y);
  // b modes: DC=0 TM=1 VE=2 HE=3 LD=4 RD=5 VR=6 VL=7 HD=8 HU=9
  private val KfYModeTree =
    Array(-4, 2, 4, 6, -0, -1, -2, -3) // {B_PRED, .., DC,V,H,TM}
  private val KfYModeProb = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)
  private val BModeTree = Array(
    -0, 2, // B_DC_PRED
    -1, 4, // B_TM_PRED
    -2, 6, // B_VE_PRED
    8, 12,
    -3, 10, // B_HE_PRED
    -5, -6, // B_RD_PRED, B_VR_PRED
    -4, 14, // B_LD_PRED
    -7, 16, // B_VL_PRED
    -8, -9) // B_HD_PRED, B_HU_PRED
  // context mode for whole-MB modes when a neighbor is not B_PRED:
  // DC->B_DC(0), V->B_VE(2), H->B_HE(3), TM->B_TM(1)
  private val YModeToB = Array(0, 2, 3, 1)
  // the extracted kf_bmode prob table is indexed by the REFERENCE
  // decoder's bmode enum, which orders RD,VR BEFORE LD,VL — map our
  // RFC-ordered enum (LD=4,RD=5,VR=6) to table indices
  private val BModeTableIdx = Array(0, 1, 2, 3, 6, 4, 5, 7, 8, 9)

  // ------------------------------------------------------------------
  // boolean decoder (RFC 6386 §7) — mirrors WebP.BoolDec, local so
  // this file is self-contained for the hot loop
  // ------------------------------------------------------------------

  private final class Bool(b: Array[Byte], start: Int, end: Int) {
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
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    def flaggedSigned(n: Int): Int =
      if (bool(128) == 0) 0
      else { val v = literal(n); if (bool(128) != 0) -v else v }
  }

  // Tree arrays above use "-0" which IS 0 — walk with an explicit
  // leaf test: node values <= 0 are leaves EXCEPT that interior
  // indices are always positive even numbers >= 2. So 0 is a leaf.
  private def treeRead(d: Bool, t: Array[Int], probs: Array[Int],
      start0: Int = 0): Int = {
    var i = start0
    while (true) {
      val n = t(i + d.bool(probs(i >> 1)))
      if (n <= 0) return -n
      i = n
    }
    0
  }

  // ------------------------------------------------------------------
  // frame state
  // ------------------------------------------------------------------

  private final class Header {
    var w = 0; var h = 0
    var mbW = 0; var mbH = 0
    // segmentation
    var segEnabled = false
    var segAbs = false
    val segQuant = new Array[Int](4)
    val segFilter = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var segUpdateMap = false
    // filter
    var filterType = 0
    var filterLevel = 0
    var sharpness = 0
    var lfDeltaEnabled = false
    val refDelta = new Array[Int](4)
    val modeDelta = new Array[Int](4)
    // quant
    var yAcQi = 0
    var y1dcD = 0; var y2dcD = 0; var y2acD = 0
    var uvdcD = 0; var uvacD = 0
    // tokens
    val probs = new Array[Byte](1056)
    var skipEnabled = false
    var skipProb = 0
  }

  private final class Quant {
    var y1dc = 0; var y1ac = 0
    var y2dc = 0; var y2ac = 0
    var uvdc = 0; var uvac = 0
  }

  // ------------------------------------------------------------------
  // public decode
  // ------------------------------------------------------------------

  /** Decode the lossy key frame of a WebP to YUV 4:2:0 planes
    * (cropped to w×h; chroma ceil-half dims). None for non-VP8,
    * interframes, or structural damage.
    */
  def decodeYuv(b: Array[Byte])
      : Option[(Int, Int, Array[Byte], Array[Byte], Array[Byte])] = {
    if (b == null || b.length < 20) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    try {
      var p = 12
      while (p + 8 <= b.length) {
        val tag = new String(
          Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "US-ASCII")
        val len = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
          ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
        if (len > Int.MaxValue || p + 8 + len > b.length) return None
        if (tag == "VP8 ") return decodeFrame(b, p + 8, len.toInt)
        p += 8 + len.toInt + (len.toInt & 1)
      }
      None
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def decodeFrame(b: Array[Byte], off: Int, len: Int)
      : Option[(Int, Int, Array[Byte], Array[Byte], Array[Byte])] = {
    if (len < 10) return None
    val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    if ((tag & 1) != 0) return None // interframe
    if (((tag >> 1) & 7) > 3) return None
    val firstPart = tag >> 5
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) return None
    val wRaw = (b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)
    val hRaw = (b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)
    val w = wRaw & 0x3fff
    val h = hRaw & 0x3fff
    if (w == 0 || h == 0) return None
    if (w.toLong * h > (1L << 26)) return None // 64 Mpx bomb guard
    if (10 + firstPart > len) return None

    val hd = new Header
    hd.w = w; hd.h = h
    hd.mbW = (w + 15) / 16; hd.mbH = (h + 15) / 16
    System.arraycopy(CoeffProbs, 0, hd.probs, 0, 1056)

    val d = new Bool(b, off + 10, off + 10 + firstPart)
    d.bool(128) // color space
    d.bool(128) // clamping
    hd.segEnabled = d.bool(128) != 0
    if (hd.segEnabled) {
      hd.segUpdateMap = d.bool(128) != 0
      val updateData = d.bool(128) != 0
      if (updateData) {
        hd.segAbs = d.bool(128) != 0
        var i = 0
        while (i < 4) { hd.segQuant(i) = d.flaggedSigned(7); i += 1 }
        i = 0
        while (i < 4) { hd.segFilter(i) = d.flaggedSigned(6); i += 1 }
      }
      if (hd.segUpdateMap) {
        var i = 0
        while (i < 3) {
          hd.segTreeProbs(i) =
            if (d.bool(128) != 0) d.literal(8) else 255
          i += 1
        }
      }
    }
    hd.filterType = d.bool(128)
    hd.filterLevel = d.literal(6)
    hd.sharpness = d.literal(3)
    hd.lfDeltaEnabled = d.bool(128) != 0
    if (hd.lfDeltaEnabled && d.bool(128) != 0) {
      var i = 0
      while (i < 4) {
        if (d.bool(128) != 0) {
          val v = d.literal(6)
          hd.refDelta(i) = if (d.bool(128) != 0) -v else v
        }
        i += 1
      }
      i = 0
      while (i < 4) {
        if (d.bool(128) != 0) {
          val v = d.literal(6)
          hd.modeDelta(i) = if (d.bool(128) != 0) -v else v
        }
        i += 1
      }
    }
    val nPartLog2 = d.literal(2)
    val nParts = 1 << nPartLog2
    hd.yAcQi = d.literal(7)
    hd.y1dcD = d.flaggedSigned(4)
    hd.y2dcD = d.flaggedSigned(4)
    hd.y2acD = d.flaggedSigned(4)
    hd.uvdcD = d.flaggedSigned(4)
    hd.uvacD = d.flaggedSigned(4)
    d.bool(128) // refresh entropy (keyframe: value ignored)
    // coefficient probability updates
    var ti = 0
    while (ti < 1056) {
      if (d.bool(CoeffUpdate(ti) & 0xff) != 0)
        hd.probs(ti) = d.literal(8).toByte
      ti += 1
    }
    hd.skipEnabled = d.bool(128) != 0
    if (hd.skipEnabled) hd.skipProb = d.literal(8)

    // token partitions: sizes trail the first partition
    val partTable = off + 10 + firstPart
    if (partTable + 3 * (nParts - 1) > off + len) return None
    val partStart = partTable + 3 * (nParts - 1)
    val partOff = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var po = partStart
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) off + len - po
        else (b(partTable + 3 * pi) & 0xff) |
          ((b(partTable + 3 * pi + 1) & 0xff) << 8) |
          ((b(partTable + 3 * pi + 2) & 0xff) << 16)
      if (sz < 0 || po + sz > off + len) return None
      partOff(pi) = po
      partEnd(pi) = po + sz
      po += sz
      pi += 1
    }
    decodeMbs(b, hd, d, partOff, partEnd)
  }

  // ------------------------------------------------------------------
  // macroblock loop
  // ------------------------------------------------------------------

  private def clampQ(i: Int): Int =
    if (i < 0) 0 else if (i > 127) 127 else i

  private def quantFor(hd: Header, seg: Int): Quant = {
    val base =
      if (!hd.segEnabled) hd.yAcQi
      else if (hd.segAbs) hd.segQuant(seg)
      else hd.yAcQi + hd.segQuant(seg)
    val q = clampQ(base)
    val qu = new Quant
    qu.y1dc = DcQ(clampQ(q + hd.y1dcD))
    qu.y1ac = AcQ(q)
    qu.y2dc = DcQ(clampQ(q + hd.y2dcD)) * 2
    qu.y2ac = {
      val v = AcQ(clampQ(q + hd.y2acD)) * 155 / 100
      if (v < 8) 8 else v
    }
    qu.uvdc = {
      val v = DcQ(clampQ(q + hd.uvdcD))
      if (v > 132) 132 else v
    }
    qu.uvac = AcQ(clampQ(q + hd.uvacD))
    qu
  }

  private def decodeMbs(b: Array[Byte], hd: Header, d: Bool,
      partOff: Array[Int], partEnd: Array[Int])
      : Option[(Int, Int, Array[Byte], Array[Byte], Array[Byte])] = {
    val mbW = hd.mbW; val mbH = hd.mbH
    val yStride = mbW * 16
    val cStride = mbW * 8
    val yPlane = new Array[Byte](yStride * mbH * 16)
    val uPlane = new Array[Byte](cStride * mbH * 8)
    val vPlane = new Array[Byte](cStride * mbH * 8)

    val nParts = partOff.length
    val parts = Array.tabulate(nParts)(i =>
      new Bool(b, partOff(i), partEnd(i)))

    // per-segment quant (resolved once)
    val quants = Array.tabulate(4)(s => quantFor(hd, s))

    // nonzero contexts: above per MB column, left per MB
    // y: 4 per MB, u/v: 2 each, y2: 1
    val aY = new Array[Boolean](mbW * 4)
    val aU = new Array[Boolean](mbW * 2)
    val aV = new Array[Boolean](mbW * 2)
    val aY2 = new Array[Boolean](mbW)
    val lY = new Array[Boolean](4)
    val lU = new Array[Boolean](2)
    val lV = new Array[Boolean](2)
    var lY2 = false

    // b-mode context rows (above per column of 4, left per MB)
    val aBMode = new Array[Int](mbW * 4) // defaults B_DC (0)
    val lBMode = new Array[Int](4)

    // per-MB records for the loop filter
    val mbSeg = new Array[Byte](mbW * mbH)
    val mbMode = new Array[Byte](mbW * mbH)
    val mbSkipLf = new Array[Boolean](mbW * mbH)

    val coeffs = new Array[Int](16)
    val y2 = new Array[Int](16)
    val block = new Array[Int](16)
    val tmp = new Array[Int](16)

    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(lY, false)
      java.util.Arrays.fill(lU, false)
      java.util.Arrays.fill(lV, false)
      lY2 = false
      java.util.Arrays.fill(lBMode, 0)
      val td = parts(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        // ---- modes (first partition)
        val seg =
          if (hd.segEnabled && hd.segUpdateMap) {
            val p = hd.segTreeProbs
            if (d.bool(p(0)) == 0) d.bool(p(1))
            else 2 + d.bool(p(2))
          } else 0
        val skip =
          if (hd.skipEnabled) d.bool(hd.skipProb) != 0 else false
        val yMode = treeRead(d, KfYModeTree, KfYModeProb)
        val bModes = new Array[Int](16)
        if (yMode == 4) { // B_PRED
          var i = 0
          while (i < 16) {
            val bx = i & 3; val by = i >> 2
            val above =
              if (by == 0) aBMode(mbX * 4 + bx) else bModes(i - 4)
            val left =
              if (bx == 0) lBMode(by) else bModes(i - 1)
            val probs = new Array[Int](9)
            val base = (BModeTableIdx(above) * 10 +
              BModeTableIdx(left)) * 9
            var k = 0
            while (k < 9) {
              probs(k) = KfBModeProbs(base + k) & 0xff; k += 1
            }
            bModes(i) = treeRead(d, BModeTree, probs)
            i += 1
          }
        } else {
          val bm = YModeToB(yMode)
          var i = 0
          while (i < 16) { bModes(i) = bm; i += 1 }
        }
        var i2 = 0
        while (i2 < 4) {
          aBMode(mbX * 4 + i2) = bModes(12 + i2)
          lBMode(i2) = bModes(i2 * 4 + 3)
          i2 += 1
        }
        val uvMode = treeRead(d, UvModeTree, KfUvModeProb)

        // ---- residuals (token partition for this row)
        val qu = quants(seg)
        java.util.Arrays.fill(y2, 0)
        val yBlocks = new Array[Array[Int]](16)
        val uBlocks = new Array[Array[Int]](4)
        val vBlocks = new Array[Array[Int]](4)
        var hasCoeffs = false
        val hasY2 = yMode != 4

        if (skip) {
          // no tokens; zero contexts
          if (hasY2) { aY2(mbX) = false; lY2 = false }
          var i = 0
          while (i < 4) { aY(mbX * 4 + i) = false; lY(i) = false
            i += 1 }
          i = 0
          while (i < 2) {
            aU(mbX * 2 + i) = false; lU(i) = false
            aV(mbX * 2 + i) = false; lV(i) = false
            i += 1
          }
        } else {
          if (hasY2) {
            val ctx = (if (lY2) 1 else 0) + (if (aY2(mbX)) 1 else 0)
            val nz = readCoeffs(td, hd.probs, 1, ctx, 0, qu.y2dc,
              qu.y2ac, coeffs)
            var k = 0
            while (k < 16) { y2(k) = coeffs(k); k += 1 }
            aY2(mbX) = nz; lY2 = nz
            if (nz) hasCoeffs = true
            iwht(y2, tmp)
          }
          // Y blocks
          val yType = if (hasY2) 0 else 3
          val first = if (hasY2) 1 else 0
          var i = 0
          while (i < 16) {
            val bx = i & 3; val by = i >> 2
            val ctx = (if (lY(by)) 1 else 0) +
              (if (aY(mbX * 4 + bx)) 1 else 0)
            val nz = readCoeffs(td, hd.probs, yType, ctx, first,
              qu.y1dc, qu.y1ac, coeffs)
            if (hasY2) coeffs(0) = tmp(i) // WHT-restored DC
            yBlocks(i) = coeffs.clone()
            aY(mbX * 4 + bx) = nz; lY(by) = nz
            if (nz) hasCoeffs = true
            i += 1
          }
          // chroma
          var pl = 0
          while (pl < 2) {
            val (aC, lC, blocks) =
              if (pl == 0) (aU, lU, uBlocks) else (aV, lV, vBlocks)
            var j = 0
            while (j < 4) {
              val bx = j & 1; val by = j >> 1
              val ctx = (if (lC(by)) 1 else 0) +
                (if (aC(mbX * 2 + bx)) 1 else 0)
              val nz = readCoeffs(td, hd.probs, 2, ctx, 0, qu.uvdc,
                qu.uvac, coeffs)
              if (nz) { blocks(j) = coeffs.clone(); hasCoeffs = true }
              aC(mbX * 2 + bx) = nz; lC(by) = nz
              j += 1
            }
            pl += 1
          }
        }

        // ---- prediction + reconstruction
        predictLuma(yPlane, yStride, mbX, mbY, mbW, yMode, bModes,
          yBlocks, block)
        predictChroma(uPlane, cStride, mbX, mbY, uvMode, uBlocks,
          block)
        predictChroma(vPlane, cStride, mbX, mbY, uvMode, vBlocks,
          block)

        val mi = mbY * mbW + mbX
        mbSeg(mi) = seg.toByte
        mbMode(mi) = yMode.toByte
        mbSkipLf(mi) = !hasCoeffs && yMode != 4
        mbX += 1
      }
      mbY += 1
    }

    // ---- loop filter over the full frame
    if (hd.filterLevel > 0)
      loopFilter(hd, yPlane, yStride, uPlane, vPlane, cStride,
        mbSeg, mbMode, mbSkipLf)

    // ---- crop
    val w = hd.w; val h = hd.h
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = new Array[Byte](w * h)
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    var r = 0
    while (r < h) {
      System.arraycopy(yPlane, r * yStride, y, r * w, w); r += 1
    }
    r = 0
    while (r < ch) {
      System.arraycopy(uPlane, r * cStride, u, r * cw, cw)
      System.arraycopy(vPlane, r * cStride, v, r * cw, cw)
      r += 1
    }
    Some((w, h, y, u, v))
  }

  // ------------------------------------------------------------------
  // residual tokens
  // ------------------------------------------------------------------

  /** Decode one 4x4 block's coefficients (dequantized, in raster
    * order after zigzag). Returns whether any nonzero coeff (the
    * nonzero-context flag — note position `first-1` exclusion).
    */
  private def readCoeffs(d: Bool, probs: Array[Byte], typ: Int,
      ctx0: Int, first: Int, dcQ: Int, acQ: Int,
      out: Array[Int]): Boolean = {
    java.util.Arrays.fill(out, 0)
    var n = first
    var ctx = ctx0
    var nonzero = false
    var prevZero = false
    while (n < 16) {
      val pOff = ((typ * 8 + Bands(n)) * 3 + ctx) * 11
      // after a DCT_0 the eob branch is skipped (start at node 2)
      val start0 = if (prevZero) 2 else 0
      val tok = readToken(d, probs, pOff, start0)
      if (tok == 11) return nonzero // eob
      if (tok == 0) {
        prevZero = true
        ctx = 0
        n += 1
      } else {
        prevZero = false
        var v = 0
        if (tok <= 4) v = tok
        else {
          val cat = tok - 5
          val cp = CatProbs(cat)
          var extra = 0
          var k = 0
          while (k < cp.length) {
            extra = (extra << 1) | d.bool(cp(k)); k += 1
          }
          v = CatBase(cat) + extra
        }
        if (d.bool(128) != 0) v = -v
        val pos = Zigzag(n)
        out(pos) = v * (if (n == 0) dcQ else acQ)
        nonzero = true
        ctx = if (tok == 1) 1 else 2
        n += 1
      }
    }
    nonzero
  }

  /** Walk the coefficient tree with probs at `pOff`. Leaves: 0..10
    * tokens, 11 = eob.
    */
  private def readToken(d: Bool, probs: Array[Byte], pOff: Int,
      start0: Int): Int = {
    var i = start0
    while (true) {
      val n = CoeffTree(i + d.bool(probs(pOff + (i >> 1)) & 0xff))
      if (n <= 0) {
        // leaves are negated token values; -11 = eob... but -0 == 0
        // (DCT_0), disambiguated because interior nodes are >= 2
        return -n
      }
      i = n
    }
    0
  }

  // ------------------------------------------------------------------
  // transforms (RFC 6386 §14.3-14.4, exact integer)
  // ------------------------------------------------------------------

  private def iwht(in: Array[Int], out: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      in(i) = a1 + b1
      in(4 + i) = c1 + d1
      in(8 + i) = a1 - b1
      in(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = in(4 * i) + in(4 * i + 3)
      val b1 = in(4 * i + 1) + in(4 * i + 2)
      val c1 = in(4 * i + 1) - in(4 * i + 2)
      val d1 = in(4 * i) - in(4 * i + 3)
      out(4 * i) = (a1 + b1 + 3) >> 3
      out(4 * i + 1) = (c1 + d1 + 3) >> 3
      out(4 * i + 2) = (a1 - b1 + 3) >> 3
      out(4 * i + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    // out in block order: out[k] is the DC of Y block k? The WHT
    // output is in raster scan of the 4x4 Y2 block; Y block k (also
    // raster) takes out[k].
  }

  private val C1 = 20091
  private val C2 = 35468

  private def idct(in: Array[Int], out: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      val t1 = (in(4 + i) * C2) >> 16
      val t2 = in(12 + i) + ((in(12 + i) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = in(4 + i) + ((in(4 + i) * C1) >> 16)
      val t4 = (in(12 + i) * C2) >> 16
      val d1 = t3 + t4
      out(i) = a1 + d1
      out(12 + i) = a1 - d1
      out(4 + i) = b1 + c1
      out(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = out(4 * i) + out(4 * i + 2)
      val b1 = out(4 * i) - out(4 * i + 2)
      val t1 = (out(4 * i + 1) * C2) >> 16
      val t2 = out(4 * i + 3) + ((out(4 * i + 3) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = out(4 * i + 1) + ((out(4 * i + 1) * C1) >> 16)
      val t4 = (out(4 * i + 3) * C2) >> 16
      val d1 = t3 + t4
      in(4 * i) = (a1 + d1 + 4) >> 3
      in(4 * i + 3) = (a1 - d1 + 4) >> 3
      in(4 * i + 1) = (b1 + c1 + 4) >> 3
      in(4 * i + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Add a residual block into the plane at (px, py). `res` holds
    * dequantized coeffs; IDCT applied here (in raster order).
    */
  private def addResidual(plane: Array[Byte], stride: Int, px: Int,
      py: Int, res: Array[Int], scratch: Array[Int]): Unit = {
    idct(res, scratch) // result lands back in res
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        val o = (py + r) * stride + px + c
        plane(o) = clamp255((plane(o) & 0xff) + res(4 * r + c)).toByte
        c += 1
      }
      r += 1
    }
  }

  // ------------------------------------------------------------------
  // intra prediction
  // ------------------------------------------------------------------

  private def predictLuma(plane: Array[Byte], stride: Int,
      mbX: Int, mbY: Int, mbW: Int, yMode: Int, bModes: Array[Int],
      yBlocks: Array[Array[Int]],
      scratch: Array[Int]): Unit = {
    val x0 = mbX * 16; val y0 = mbY * 16
    if (yMode == 4) {
      // B_PRED: per-4x4 predict + reconstruct in order
      var i = 0
      while (i < 16) {
        val bx = x0 + (i & 3) * 4
        val by = y0 + (i >> 2) * 4
        predict4x4(plane, stride, bx, by, bModes(i), mbX, mbY, mbW,
          i)
        if (yBlocks(i) != null)
          addResidual(plane, stride, bx, by, yBlocks(i), scratch)
        i += 1
      }
    } else {
      predictWhole(plane, stride, x0, y0, 16, yMode)
      var i = 0
      while (i < 16) {
        if (yBlocks(i) != null)
          addResidual(plane, stride, x0 + (i & 3) * 4,
            y0 + (i >> 2) * 4, yBlocks(i), scratch)
        i += 1
      }
    }
  }

  private def predictChroma(plane: Array[Byte], stride: Int,
      mbX: Int, mbY: Int, mode: Int, blocks: Array[Array[Int]],
      scratch: Array[Int]): Unit = {
    val x0 = mbX * 8; val y0 = mbY * 8
    predictWhole(plane, stride, x0, y0, 8, mode)
    var i = 0
    while (i < 4) {
      if (blocks(i) != null)
        addResidual(plane, stride, x0 + (i & 1) * 4,
          y0 + (i >> 1) * 4, blocks(i), scratch)
      i += 1
    }
  }

  /** Whole-block DC/V/H/TM prediction for 16x16 luma / 8x8 chroma. */
  private def predictWhole(plane: Array[Byte], stride: Int, x0: Int,
      y0: Int, sz: Int, mode: Int): Unit = {
    val haveA = y0 > 0
    val haveL = x0 > 0
    @inline def above(c: Int): Int =
      if (haveA) plane((y0 - 1) * stride + x0 + c) & 0xff else 127
    @inline def left(r: Int): Int =
      if (haveL) plane((y0 + r) * stride + x0 - 1) & 0xff else 129
    // border convention (libvpx setup_intra_recon): the row above
    // the frame is 127 INCLUDING its (-1,-1) corner; the column left
    // of the frame is 129 for rows >= 0
    val tl =
      if (haveA && haveL) plane((y0 - 1) * stride + x0 - 1) & 0xff
      else if (!haveA) 127 // top border (incl corner)
      else 129 // left border
    mode match {
      case 0 => // DC
        var sum = 0
        val shift = if (sz == 16) 4 else 3
        var n = 0
        if (haveA) { var c = 0; while (c < sz) { sum += above(c)
          c += 1 }; n += 1 }
        if (haveL) { var r = 0; while (r < sz) { sum += left(r)
          r += 1 }; n += 1 }
        val dc =
          if (n == 0) 128
          else {
            val total = shift + n - 1
            (sum + (1 << (total - 1))) >> total
          }
        fill(plane, stride, x0, y0, sz, dc)
      case 1 => // V
        var r = 0
        while (r < sz) {
          var c = 0
          while (c < sz) {
            plane((y0 + r) * stride + x0 + c) = above(c).toByte
            c += 1
          }
          r += 1
        }
      case 2 => // H
        var r = 0
        while (r < sz) {
          val v = left(r).toByte
          var c = 0
          while (c < sz) {
            plane((y0 + r) * stride + x0 + c) = v; c += 1
          }
          r += 1
        }
      case _ => // TM
        var r = 0
        while (r < sz) {
          val l = left(r)
          var c = 0
          while (c < sz) {
            plane((y0 + r) * stride + x0 + c) =
              clamp255(l + above(c) - tl).toByte
            c += 1
          }
          r += 1
        }
    }
  }

  private def fill(plane: Array[Byte], stride: Int, x0: Int,
      y0: Int, sz: Int, v: Int): Unit = {
    val b = v.toByte
    var r = 0
    while (r < sz) {
      var c = 0
      while (c < sz) { plane((y0 + r) * stride + x0 + c) = b; c += 1 }
      r += 1
    }
  }

  /** 4x4 B_PRED prediction (RFC 6386 §12.3). Needs 13 border
    * pixels: 4 left (L0..L3 top-down), 1 top-left, 8 above
    * (A0..A7). The above-right (A4..A7) follow VP8's quirk: for
    * right-column subblocks below the top row they replicate the
    * MB's top edge, and off-frame edges use the 127/129 defaults.
    */
  private def predict4x4(plane: Array[Byte], stride: Int, bx: Int,
      by: Int, mode: Int, mbX: Int, mbY: Int, mbW: Int,
      subIdx: Int): Unit = {
    val haveA = by > 0
    val haveL = bx > 0
    @inline def P(x: Int, y: Int): Int = plane(y * stride + x) & 0xff
    val L = new Array[Int](4)
    var r = 0
    while (r < 4) {
      L(r) = if (haveL) P(bx - 1, by + r) else 129
      r += 1
    }
    val TL =
      if (haveA && haveL) P(bx - 1, by - 1)
      else if (haveA) 129 // left edge of frame: left default
      else if (haveL) 127 // top edge: above default
      else 127
    val A = new Array[Int](8)
    var c = 0
    while (c < 4) {
      A(c) = if (haveA) P(bx + c, by - 1) else 127
      c += 1
    }
    // above-right: subblock col within MB
    val sbx = subIdx & 3
    val sby = subIdx >> 2
    val mbRight = (mbX + 1) * 16 // frame x of next MB
    c = 4
    while (c < 8) {
      val ax = bx + c
      A(c) =
        if (!haveA) 127
        else if (sbx == 3) {
          // right column: above-right pixels come from the MB's top
          // edge row (the row above this MB), columns 16..19; for
          // the frame's rightmost MB those pixels do not exist and
          // the edge is EXTENDED from the above MB's last pixel
          // (not 127) — the quirk real encoders rely on
          val tx = mbRight + (c - 4)
          val ty = mbY * 16 - 1
          if (ty < 0) 127
          else if (tx >= stride) P(stride - 1, ty)
          else P(tx, ty)
        }
        else P(ax, by - 1) // interior: truly adjacent row above
      c += 1
    }
    @inline def avg3(a: Int, b2: Int, c2: Int): Int =
      (a + 2 * b2 + c2 + 2) >> 2
    @inline def avg2(a: Int, b2: Int): Int = (a + b2 + 1) >> 1
    val o = new Array[Int](16)
    mode match {
      case 0 => // B_DC_PRED
        var sum = 4
        var i = 0
        while (i < 4) { sum += A(i) + L(i); i += 1 }
        val dc = sum >> 3
        i = 0
        while (i < 16) { o(i) = dc; i += 1 }
      case 1 => // B_TM_PRED
        var rr = 0
        while (rr < 4) {
          var cc = 0
          while (cc < 4) {
            o(rr * 4 + cc) = clamp255(L(rr) + A(cc) - TL); cc += 1
          }
          rr += 1
        }
      case 2 => // B_VE_PRED
        val t = Array(
          avg3(TL, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
        var rr = 0
        while (rr < 4) {
          var cc = 0
          while (cc < 4) { o(rr * 4 + cc) = t(cc); cc += 1 }
          rr += 1
        }
      case 3 => // B_HE_PRED
        val l = Array(
          avg3(TL, L(0), L(1)), avg3(L(0), L(1), L(2)),
          avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
        var rr = 0
        while (rr < 4) {
          var cc = 0
          while (cc < 4) { o(rr * 4 + cc) = l(rr); cc += 1 }
          rr += 1
        }
      case 4 => // B_LD_PRED
        o(0) = avg3(A(0), A(1), A(2))
        o(1) = avg3(A(1), A(2), A(3)); o(4) = o(1)
        o(2) = avg3(A(2), A(3), A(4)); o(5) = o(2); o(8) = o(2)
        o(3) = avg3(A(3), A(4), A(5)); o(6) = o(3); o(9) = o(3)
        o(12) = o(3)
        o(7) = avg3(A(4), A(5), A(6)); o(10) = o(7); o(13) = o(7)
        o(11) = avg3(A(5), A(6), A(7)); o(14) = o(11)
        o(15) = avg3(A(6), A(7), A(7))
      case 5 => // B_RD_PRED
        o(12) = avg3(L(3), L(2), L(1))
        o(8) = avg3(L(2), L(1), L(0)); o(13) = o(8)
        o(4) = avg3(L(1), L(0), TL); o(9) = o(4); o(14) = o(4)
        o(0) = avg3(L(0), TL, A(0)); o(5) = o(0); o(10) = o(0)
        o(15) = o(0)
        o(1) = avg3(TL, A(0), A(1)); o(6) = o(1); o(11) = o(1)
        o(2) = avg3(A(0), A(1), A(2)); o(7) = o(2)
        o(3) = avg3(A(1), A(2), A(3))
      case 6 => // B_VR_PRED
        o(12) = avg3(L(2), L(1), L(0))
        o(8) = avg3(L(1), L(0), TL)
        o(4) = avg3(L(0), TL, A(0)); o(13) = o(4)
        o(0) = avg2(TL, A(0)); o(9) = o(0); // col 0
        o(5) = avg3(TL, A(0), A(1)); o(14) = o(5)
        o(1) = avg2(A(0), A(1)); o(10) = o(1)
        o(6) = avg3(A(0), A(1), A(2)); o(15) = o(6)
        o(2) = avg2(A(1), A(2)); o(11) = o(2)
        o(7) = avg3(A(1), A(2), A(3))
        o(3) = avg2(A(2), A(3))
      case 7 => // B_VL_PRED
        o(0) = avg2(A(0), A(1))
        o(4) = avg3(A(0), A(1), A(2))
        o(1) = avg2(A(1), A(2)); o(8) = o(1)
        o(5) = avg3(A(1), A(2), A(3)); o(12) = o(5)
        o(2) = avg2(A(2), A(3)); o(9) = o(2)
        o(6) = avg3(A(2), A(3), A(4)); o(13) = o(6)
        o(3) = avg2(A(3), A(4)); o(10) = o(3)
        o(7) = avg3(A(3), A(4), A(5)); o(14) = o(7)
        o(11) = avg3(A(4), A(5), A(6))
        o(15) = avg3(A(5), A(6), A(7))
      case 8 => // B_HD_PRED
        o(12) = avg2(L(3), L(2))
        o(13) = avg3(L(3), L(2), L(1))
        o(8) = avg2(L(2), L(1)); o(14) = o(8)
        o(9) = avg3(L(2), L(1), L(0)); o(15) = o(9)
        o(4) = avg2(L(1), L(0)); o(10) = o(4)
        o(5) = avg3(L(1), L(0), TL); o(11) = o(5)
        o(0) = avg2(L(0), TL); o(6) = o(0)
        o(1) = avg3(L(0), TL, A(0)); o(7) = o(1)
        o(2) = avg3(TL, A(0), A(1))
        o(3) = avg3(A(0), A(1), A(2))
      case _ => // B_HU_PRED
        o(0) = avg2(L(0), L(1))
        o(1) = avg3(L(0), L(1), L(2))
        o(2) = avg2(L(1), L(2)); o(4) = o(2)
        o(3) = avg3(L(1), L(2), L(3)); o(5) = o(3)
        o(6) = avg2(L(2), L(3)); o(8) = o(6)
        o(7) = avg3(L(2), L(3), L(3)); o(9) = o(7)
        o(10) = L(3); o(11) = L(3); o(12) = L(3); o(13) = L(3)
        o(14) = L(3); o(15) = L(3)
    }
    var rr = 0
    while (rr < 4) {
      var cc = 0
      while (cc < 4) {
        plane((by + rr) * stride + bx + cc) = o(rr * 4 + cc).toByte
        cc += 1
      }
      rr += 1
    }
  }

  // ------------------------------------------------------------------
  // loop filter (RFC 6386 §15)
  // ------------------------------------------------------------------

  @inline private def sClamp(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v
  @inline private def u2s(v: Int): Int = v - 128
  @inline private def s2u(v: Int): Int = clamp255(v + 128)

  private def loopFilter(hd: Header, yP: Array[Byte], yS: Int,
      uP: Array[Byte], vP: Array[Byte], cS: Int,
      mbSeg: Array[Byte], mbMode: Array[Byte],
      mbSkipLf: Array[Boolean]): Unit = {
    val mbW = hd.mbW; val mbH = hd.mbH
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        val seg = mbSeg(mi)
        val mode = mbMode(mi)
        var level =
          if (!hd.segEnabled) hd.filterLevel
          else if (hd.segAbs) hd.segFilter(seg)
          else hd.filterLevel + hd.segFilter(seg)
        if (hd.lfDeltaEnabled) {
          level += hd.refDelta(0) // intra frame
          if (mode == 4) level += hd.modeDelta(0) // B_PRED
        }
        if (level < 0) level = 0
        if (level > 63) level = 63
        if (level > 0) {
          var interior =
            if (hd.sharpness > 0) {
              var v = level >> (if (hd.sharpness > 4) 2 else 1)
              if (v > 9 - hd.sharpness) v = 9 - hd.sharpness
              v
            } else level
          if (interior < 1) interior = 1
          val hevT =
            if (level >= 40) 2 else if (level >= 15) 1 else 0
          val mbLim = ((level + 2) * 2) + interior
          val subLim = (level * 2) + interior
          val inner = !mbSkipLf(mi)
          if (hd.filterType == 0) {
            // normal filter: luma + chroma
            filterMbNormal(yP, yS, mbX * 16, mbY * 16, 16, mbLim,
              subLim, interior, hevT, mbX > 0, mbY > 0, inner, 4)
            filterMbNormal(uP, cS, mbX * 8, mbY * 8, 8, mbLim,
              subLim, interior, hevT, mbX > 0, mbY > 0, inner, 4)
            filterMbNormal(vP, cS, mbX * 8, mbY * 8, 8, mbLim,
              subLim, interior, hevT, mbX > 0, mbY > 0, inner, 4)
          } else {
            // simple filter: luma only, edge masks only
            filterMbSimple(yP, yS, mbX * 16, mbY * 16, mbLim,
              subLim, mbX > 0, mbY > 0, inner)
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  /** One MB's normal filtering: left MB edge, inner vertical edges,
    * top MB edge, inner horizontal edges.
    */
  private def filterMbNormal(p: Array[Byte], stride: Int, x0: Int,
      y0: Int, sz: Int, mbLim: Int, subLim: Int, interior: Int,
      hevT: Int, haveLeft: Boolean, haveTop: Boolean,
      inner: Boolean, step: Int): Unit = {
    // vertical edges (filter across columns)
    if (haveLeft) {
      var r = 0
      while (r < sz) {
        mbEdge(p, (y0 + r) * stride + x0, 1, mbLim, interior, hevT)
        r += 1
      }
    }
    if (inner) {
      var e = step
      while (e < sz) {
        var r = 0
        while (r < sz) {
          subEdge(p, (y0 + r) * stride + x0 + e, 1, subLim,
            interior, hevT)
          r += 1
        }
        e += step
      }
    }
    // horizontal edges (filter across rows)
    if (haveTop) {
      var c = 0
      while (c < sz) {
        mbEdge(p, y0 * stride + x0 + c, stride, mbLim, interior,
          hevT)
        c += 1
      }
    }
    if (inner) {
      var e = step
      while (e < sz) {
        var c = 0
        while (c < sz) {
          subEdge(p, (y0 + e) * stride + x0 + c, stride, subLim,
            interior, hevT)
          c += 1
        }
        e += step
      }
    }
  }

  @inline private def abs(v: Int): Int = if (v < 0) -v else v

  /** Normal-filter mask over p3..q3 (§15.2). */
  @inline private def normalMask(p: Array[Byte], o: Int, s: Int,
      edgeLim: Int, interior: Int): Boolean = {
    val p3 = p(o - 4 * s) & 0xff; val p2 = p(o - 3 * s) & 0xff
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    val q2 = p(o + 2 * s) & 0xff; val q3 = p(o + 3 * s) & 0xff
    abs(p0 - q0) * 2 + abs(p1 - q1) / 2 <= edgeLim &&
      abs(p3 - p2) <= interior && abs(p2 - p1) <= interior &&
      abs(p1 - p0) <= interior && abs(q1 - q0) <= interior &&
      abs(q2 - q1) <= interior && abs(q3 - q2) <= interior
  }

  @inline private def isHev(p: Array[Byte], o: Int, s: Int,
      t: Int): Boolean = {
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    abs(p1 - p0) > t || abs(q1 - q0) > t
  }

  /** §15.3 common adjustment on p1,p0,q0,q1; returns the filter F. */
  private def commonAdjust(p: Array[Byte], o: Int, s: Int,
      useOuter: Boolean): Int = {
    val P1 = u2s(p(o - 2 * s) & 0xff)
    val P0 = u2s(p(o - s) & 0xff)
    val Q0 = u2s(p(o) & 0xff)
    val Q1 = u2s(p(o + s) & 0xff)
    val a = sClamp((if (useOuter) sClamp(P1 - Q1) else 0) +
      3 * (Q0 - P0))
    val f1 = sClamp(a + 4) >> 3
    val f2 = sClamp(a + 3) >> 3
    p(o) = s2u(Q0 - f1).toByte
    p(o - s) = s2u(P0 + f2).toByte
    f1
  }

  private def subEdge(p: Array[Byte], o: Int, s: Int, lim: Int,
      interior: Int, hevT: Int): Unit = {
    if (!normalMask(p, o, s, lim, interior)) return
    val hev = isHev(p, o, s, hevT)
    val f = commonAdjust(p, o, s, hev)
    if (!hev) {
      val a = (f + 1) >> 1
      p(o + s) = s2u(u2s(p(o + s) & 0xff) - a).toByte
      p(o - 2 * s) = s2u(u2s(p(o - 2 * s) & 0xff) + a).toByte
    }
  }

  private def mbEdge(p: Array[Byte], o: Int, s: Int, lim: Int,
      interior: Int, hevT: Int): Unit = {
    if (!normalMask(p, o, s, lim, interior)) return
    if (isHev(p, o, s, hevT)) {
      commonAdjust(p, o, s, useOuter = true)
    } else {
      val P2 = u2s(p(o - 3 * s) & 0xff)
      val P1 = u2s(p(o - 2 * s) & 0xff)
      val P0 = u2s(p(o - s) & 0xff)
      val Q0 = u2s(p(o) & 0xff)
      val Q1 = u2s(p(o + s) & 0xff)
      val Q2 = u2s(p(o + 2 * s) & 0xff)
      val w = sClamp(sClamp(P1 - Q1) + 3 * (Q0 - P0))
      var a = sClamp((27 * w + 63) >> 7)
      p(o) = s2u(Q0 - a).toByte
      p(o - s) = s2u(P0 + a).toByte
      a = sClamp((18 * w + 63) >> 7)
      p(o + s) = s2u(Q1 - a).toByte
      p(o - 2 * s) = s2u(P1 + a).toByte
      a = sClamp((9 * w + 63) >> 7)
      p(o + 2 * s) = s2u(Q2 - a).toByte
      p(o - 3 * s) = s2u(P2 + a).toByte
    }
  }

  /** Simple filter (§15.1): luma only, both edge classes. */
  private def filterMbSimple(p: Array[Byte], stride: Int, x0: Int,
      y0: Int, mbLim: Int, subLim: Int, haveLeft: Boolean,
      haveTop: Boolean, inner: Boolean): Unit = {
    @inline def simple(o: Int, s: Int, lim: Int): Unit = {
      val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
      val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
      if (abs(p0 - q0) * 2 + abs(p1 - q1) / 2 <= lim)
        commonAdjust(p, o, s, useOuter = true)
    }
    if (haveLeft) {
      var r = 0
      while (r < 16) { simple((y0 + r) * stride + x0, 1, mbLim)
        r += 1 }
    }
    if (inner) {
      var e = 4
      while (e < 16) {
        var r = 0
        while (r < 16) {
          simple((y0 + r) * stride + x0 + e, 1, subLim); r += 1
        }
        e += 4
      }
    }
    if (haveTop) {
      var c = 0
      while (c < 16) { simple(y0 * stride + x0 + c, stride, mbLim)
        c += 1 }
    }
    if (inner) {
      var e = 4
      while (e < 16) {
        var c = 0
        while (c < 16) {
          simple((y0 + e) * stride + x0 + c, stride, subLim); c += 1
        }
        e += 4
      }
    }
  }

  // ------------------------------------------------------------------
  // Spark plumbing: the reference-pinned fixture set as a query
  // ------------------------------------------------------------------

  /** The 18 committed reference fixtures (bit-exactness against the
    * reference decoder is proven per-plane in Vp8Spec; the oracle
    * pins the Y-plane average hash of each, computed INDEPENDENTLY
    * from the reference decoder's own YUV output at generation
    * time).
    */
  private lazy val Fixtures: Array[Array[Byte]] = {
    val names = Seq("g00", "g01", "g02", "g03", "g04", "g05", "g06",
      "g07", "g08", "g09", "n00", "n02", "n04", "n06", "n07",
      "m75", "m60", "m85")
    names.map(n => resource(s"/vp8fix/$n.webp")).toArray
  }

  val vp8Schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vp8_w",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("vp8_h",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("y_ahash",
        org.apache.spark.sql.types.LongType)))

  /** Decode kernel: full lossy pixel decode -> Y-plane average
    * hash (the image near-dup signal). Null row for refusals.
    */
  def decodeVp8AHash(bytes: Array[Byte]): Seq[Any] =
    decodeYuv(bytes) match {
      case Some((w, h, y, _, _)) =>
        val luma = new Array[Int](w * h)
        var i = 0
        while (i < luma.length) { luma(i) = y(i) & 0xff; i += 1 }
        Seq[Any](w, h, Multimodal.averageHash64(luma, w, h))
      case None => Seq[Any](null, null, null)
    }

  /** Per-row fixture attach: doc_id % 18 selects the reference
    * .webp (map-only; the fixture array loads once per executor).
    */
  def synthVp8(df: org.apache.spark.sql.DataFrame, idCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
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
        val fx = Fixtures(java.lang.Math.floorMod(id, 18L).toInt)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ fx)
      }
    }(enc)
  }
}
