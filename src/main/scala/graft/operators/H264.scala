package graft.operators

/** H.264/AVC sequence-parameter-set HEADER parse (ITU-T H.264
  * §7.3.2.1.1) — dimensions, profile and level only, no entropy
  * decode of picture data. This is the triage layer for the dominant
  * real-world video codec: a crawl pipeline can rank/route/dedup-key
  * generic MP4s by real coded dimensions instead of a bare fourcc,
  * while pixel decode stays an honest refusal (the CABAC/CAVLC
  * slice machinery is out of scope, documented at the fakeDecode
  * stub).
  *
  * Scope: Exp-Golomb bit parsing of every SPS field up to the
  * cropping window, including the high-profile chroma branch and a
  * full scaling-list SKIP (still just ue/se reads), emulation-
  * prevention-byte unescaping, and the exact crop-unit arithmetic
  * per chroma format. Malformed bits → None, never a throw and
  * never wrong dimensions.
  *
  * Reference behavior studied: pytrousse has no media layer at all
  * (/root/reference/src/trousse/dataset.py:1); this module is part
  * of the beyond-parity multimodal surface like [[Multimodal]].
  */
object H264 {

  /** Parsed SPS header: profile_idc, level_idc, displayable width
    * and height after frame cropping.
    */
  final case class SpsInfo(profileIdc: Int, levelIdc: Int,
      width: Int, height: Int)

  private object SpsFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** Profiles whose SPS carries the chroma-format branch
    * (§7.3.2.1.1: High and friends).
    */
  private val HighProfiles = Set(100, 110, 122, 244, 44, 83, 86,
    118, 128, 138, 139, 134, 135)

  /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (the 03 is
    * the escape, §7.4.1.1).
    */
  private[graft] def unescapeRbsp(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length - from)
    var i = from
    var zeros = 0
    while (i < nal.length) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) {
        zeros = 0 // escape byte: dropped
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def u1(): Int = {
      if (pos >= b.length * 8) throw SpsFail
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** Exp-Golomb unsigned (§9.1). */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw SpsFail
      }
      if (zeros == 0) 0
      else ((1 << zeros) - 1) + u(zeros)
    }
    /** Exp-Golomb signed (§9.1.1). */
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Parse one SPS NAL (with its 1-byte NAL header, emulation bytes
    * still present — i.e. exactly the bytes an avcC record carries).
    */
  def spsParse(nal: Array[Byte]): Option[SpsInfo] = {
    if (nal == null || nal.length < 5) return None
    if ((nal(0) & 0x80) != 0) return None // forbidden_zero_bit
    if ((nal(0) & 0x1f) != 7) return None // nal_unit_type SPS
    try {
      val r = new BitReader(unescapeRbsp(nal, 1))
      val profile = r.u(8)
      r.u(8) // constraint flags + reserved
      val level = r.u(8)
      r.ue() // seq_parameter_set_id
      var chromaFormat = 1 // default 4:2:0 when the branch is absent
      var separateColour = false
      if (HighProfiles.contains(profile)) {
        chromaFormat = r.ue()
        if (chromaFormat > 3) throw SpsFail
        if (chromaFormat == 3) separateColour = r.u1() == 1
        r.ue() // bit_depth_luma_minus8
        r.ue() // bit_depth_chroma_minus8
        r.u1() // qpprime_y_zero_transform_bypass_flag
        if (r.u1() == 1) { // seq_scaling_matrix_present_flag
          val nLists = if (chromaFormat == 3) 12 else 8
          var li = 0
          while (li < nLists) {
            if (r.u1() == 1) { // seq_scaling_list_present_flag[li]
              // scaling_list(): delta_scale chain, skip-only
              val size = if (li < 6) 16 else 64
              var lastScale = 8
              var nextScale = 8
              var j = 0
              while (j < size) {
                if (nextScale != 0) {
                  val delta = r.se()
                  nextScale = (lastScale + delta + 256) % 256
                }
                if (nextScale != 0) lastScale = nextScale
                j += 1
              }
            }
            li += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
        case 1 =>
          r.u1() // delta_pic_order_always_zero_flag
          r.se() // offset_for_non_ref_pic
          r.se() // offset_for_top_to_bottom_field
          val n = r.ue() // num_ref_frames_in_pic_order_cnt_cycle
          if (n > 255) throw SpsFail
          var i = 0
          while (i < n) { r.se(); i += 1 }
        case 2 => ()
        case _ => throw SpsFail
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed_flag
      val mbW = r.ue() + 1 // pic_width_in_mbs_minus1
      val mapH = r.ue() + 1 // pic_height_in_map_units_minus1
      if (mbW > 32768 || mapH > 32768) throw SpsFail
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
      r.u1() // direct_8x8_inference_flag
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u1() == 1) { // frame_cropping_flag
        cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      }
      // crop units by chroma format (§7.4.2.1.1): monochrome or
      // separate planes crop in luma samples
      val (subW, subH) = chromaFormat match {
        case 1 => (2, 2)
        case 2 => (2, 1)
        case _ => (1, 1) // 0 (mono) and 3 (4:4:4)
      }
      val (cuX, cuY) =
        if (chromaFormat == 0 || separateColour)
          (1, 2 - frameMbsOnly)
        else (subW, subH * (2 - frameMbsOnly))
      val w = mbW * 16 - cuX * (cl + cr)
      val h = (2 - frameMbsOnly) * mapH * 16 - cuY * (ct + cb)
      if (w <= 0 || h <= 0) throw SpsFail
      Some(SpsInfo(profile, level, w, h))
    } catch {
      case SpsFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Parse the first SPS out of an AVCDecoderConfigurationRecord
    * (ISO 14496-15 §5.3.3.1: ver, profile, compat, level,
    * lengthSize, numSPS, then 16-bit-length-prefixed SPS NALs).
    */
  def avcCSps(rec: Array[Byte]): Option[SpsInfo] = {
    if (rec == null || rec.length < 8) return None
    if ((rec(0) & 0xff) != 1) return None // configurationVersion
    val numSps = rec(5) & 0x1f
    if (numSps < 1) return None
    val len = ((rec(6) & 0xff) << 8) | (rec(7) & 0xff)
    if (8 + len > rec.length) return None
    spsParse(java.util.Arrays.copyOfRange(rec, 8, 8 + len))
  }

  // ------------------------------------------------------------------
  // fixture writers — real bit-exact SPS the parser must reverse
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def u1(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val x = v + 1
      val bits = 32 - Integer.numberOfLeadingZeros(x)
      u(0, bits - 1) // leading zeros
      u(x, bits)
    }
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte. */
    def stop(): Array[Byte] = {
      u1(1)
      while (nBits != 0) u1(0)
      out.toByteArray
    }
  }

  /** Insert emulation-prevention bytes (00 00 {00,01,02,03} gets an
    * 03 escape after the two zeros).
    */
  private[graft] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xff) <= 3) {
        out.write(3)
        zeros = 0
      }
      out.write(b & 0xff)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Encode a real SPS NAL for even `w`×`h` (4:2:0, progressive):
    * mb-aligned size plus the exact bottom/right crop. `profile`
    * 66/77 write the baseline layout, 100 writes the chroma branch.
    */
  def spsEncode(profile: Int, level: Int, w: Int, h: Int)
      : Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"dims must be positive and even: ${w}x$h")
    val mbW = (w + 15) / 16
    val mapH = (h + 15) / 16
    val bw = new BitWriter
    bw.u(profile, 8)
    bw.u(0, 8) // constraint flags
    bw.u(level, 8)
    bw.ue(0) // seq_parameter_set_id
    if (HighProfiles.contains(profile)) {
      bw.ue(1) // chroma_format_idc 4:2:0
      bw.ue(0); bw.ue(0) // bit depths
      bw.u1(0) // qpprime
      bw.u1(0) // no scaling matrix
    }
    bw.ue(0) // log2_max_frame_num_minus4
    bw.ue(0) // pic_order_cnt_type 0
    bw.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    bw.ue(1) // max_num_ref_frames
    bw.u1(0) // gaps allowed
    bw.ue(mbW - 1)
    bw.ue(mapH - 1)
    bw.u1(1) // frame_mbs_only
    bw.u1(1) // direct_8x8_inference
    val cropR = (mbW * 16 - w) / 2
    val cropB = (mapH * 16 - h) / 2
    if (cropR > 0 || cropB > 0) {
      bw.u1(1)
      bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB)
    } else bw.u1(0)
    bw.u1(0) // vui_parameters_present_flag
    Array(0x67.toByte) ++ escapeRbsp(bw.stop())
  }

  /** Encode an AVCDecoderConfigurationRecord holding one SPS (no
    * PPS — the parser only reads the SPS; real triage ignores PPS).
    */
  def avcCEncode(profile: Int, level: Int, w: Int, h: Int)
      : Array[Byte] = {
    val sps = spsEncode(profile, level, w, h)
    Array[Byte](1, profile.toByte, 0, level.toByte,
      0xff.toByte, // reserved + lengthSizeMinusOne 3
      0xe1.toByte, // reserved + numSPS 1
      ((sps.length >> 8) & 0xff).toByte, (sps.length & 0xff).toByte) ++
      sps ++ Array[Byte](0) // numPPS 0
  }
}
