package graft.operators

/** LZFu compressed RTF ([MS-OXRTFCP], the wrapper Outlook uses for
  * every PidTagRtfCompressed body): a 4096-byte ring dictionary
  * pre-seeded with the spec's 207-byte RTF-prologue string, control
  * bytes whose bits (LSB first) select literal vs 16-bit big-endian
  * dictionary references (12-bit offset, 4-bit length−2), terminated
  * by a reference whose offset equals the current write position.
  *
  * Provenance of the initial dictionary: transcribed from the
  * public [MS-OXRTFCP] §2.1.2.1.2 prologue text. The transcription
  * carries a structural self-check — the spec states the dictionary
  * is exactly 207 bytes and initializes the write position to 207,
  * and the transcribed string is byte-length 207 (asserted at class
  * load and in LzfuSpec). No reference LZFu implementation or real
  * Outlook .msg exists in this environment to golden-pin against
  * (probed: compressed_rtf / extract_msg / pypff Python modules and
  * a filesystem-wide *.msg search — all absent); the round-trip
  * suite exercises references INTO the pre-seeded dictionary region
  * so a transcription error in any referenced byte would break the
  * exact-text oracle, not just interop.
  *
  * CRC is the spec's table-driven CRC32 (standard reflected
  * polynomial 0xEDB88320) with zero init and NO final complement —
  * deliberately not `java.util.zip.CRC32`, which differs in both.
  */
object Lzfu {

  /** [MS-OXRTFCP] §2.1.2.1.2 initial dictionary (exactly 207
    * bytes; `\r\n` are literal CR LF).
    */
  private[graft] val Dict: Array[Byte] =
    ("{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}" +
      "{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript " +
      "\\fdecor MS Sans SerifSymbolArialTimes New RomanCourier" +
      "{\\colortbl\\red0\\green0\\blue0\r\n\\par " +
      "\\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  require(Dict.length == 207, s"dictionary must be 207 bytes, " +
    s"transcription gives ${Dict.length}")

  private val RingSize = 4096
  private val InitPos = Dict.length // 207

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  /** Spec CRC: table-driven, init 0, no final XOR. */
  private[graft] def crc(b: Array[Byte], from: Int, until: Int)
      : Long = {
    var c = 0
    var i = from
    while (i < until) {
      c = CrcTable((c ^ b(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    c & 0xffffffffL
  }

  /** Decode the LZFu token stream in `d[from, until)`. None for a
    * stream that runs out before its terminator, or output past
    * `maxOut`. The caller has already validated the 16-byte header.
    */
  private[graft] def decode(d: Array[Byte], from: Int, until: Int,
      maxOut: Int): Option[Array[Byte]] = {
    val ring = new Array[Byte](RingSize)
    System.arraycopy(Dict, 0, ring, 0, InitPos)
    var wp = InitPos
    val out = new java.io.ByteArrayOutputStream(
      math.max(16, (until - from) * 2))
    var p = from
    while (p < until) {
      var ctrl = d(p) & 0xff
      p += 1
      var bit = 0
      while (bit < 8) {
        if ((ctrl & 1) != 0) {
          // dictionary reference: 16-bit BE, 12-bit offset + len-2
          if (p + 2 > until) return None
          val b1 = d(p) & 0xff
          val b2 = d(p + 1) & 0xff
          p += 2
          val off = (b1 << 4) | (b2 >> 4)
          val len = (b2 & 0x0f) + 2
          if (off == wp) return Some(out.toByteArray) // terminator
          var k = 0
          while (k < len) {
            val c2 = ring((off + k) & 0xfff)
            out.write(c2 & 0xff)
            ring(wp) = c2
            wp = (wp + 1) & 0xfff
            k += 1
          }
        } else {
          if (p >= until) return None
          val c2 = d(p)
          p += 1
          out.write(c2 & 0xff)
          ring(wp) = c2
          wp = (wp + 1) & 0xfff
        }
        if (out.size > maxOut) return None
        ctrl >>= 1
        bit += 1
      }
    }
    None // input exhausted before the terminator
  }

  /** Compress `data` into a full PidTagRtfCompressed value (16-byte
    * header + token stream). Greedy longest-match against the ring
    * (pre-seeded region included — common RTF prologues match the
    * spec dictionary, so decode exercises the transcription).
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val ring = new Array[Byte](RingSize)
    System.arraycopy(Dict, 0, ring, 0, InitPos)
    var wp = InitPos
    var filled = InitPos // valid bytes in the ring (≤ 4096)
    val toks = new java.io.ByteArrayOutputStream(data.length + 64)
    var ctrl = 0
    var nbits = 0
    val group = new java.io.ByteArrayOutputStream(17)
    def flush(): Unit = {
      if (nbits > 0) {
        toks.write(ctrl)
        group.writeTo(toks)
        group.reset()
        ctrl = 0; nbits = 0
      }
    }
    /** Record one token: its control bit AND its bytes, then flush
      * a full group — bit and bytes must land in the same group.
      */
    def emit(isRef: Boolean, bytes: Int*): Unit = {
      if (isRef) ctrl |= (1 << nbits)
      bytes.foreach(v => group.write(v & 0xff))
      nbits += 1
      if (nbits == 8) flush()
    }
    def push(c: Byte): Unit = {
      ring(wp) = c
      wp = (wp + 1) & 0xfff
      if (filled < RingSize) filled += 1
    }
    var i = 0
    while (i < data.length) {
      // longest ring match of length 3..17 not crossing the write
      // position (no self-overlap tricks — plain existing content)
      var bestLen = 0
      var bestOff = 0
      var s = 0
      while (s < filled) {
        if (s != wp) {
          var l = 0
          val maxL = math.min(17, data.length - i)
          while (l < maxL && ((s + l) & 0xfff) != wp &&
              ring((s + l) & 0xfff) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestOff = s }
        }
        s += 1
      }
      if (bestLen >= 3) {
        emit(true, (bestOff >> 4) & 0xff,
          ((bestOff & 0x0f) << 4) | (bestLen - 2))
        var k = 0
        while (k < bestLen) { push(data(i + k)); k += 1 }
        i += bestLen
      } else {
        emit(false, data(i) & 0xff)
        push(data(i))
        i += 1
      }
    }
    // terminator: reference whose offset equals the write position
    emit(true, (wp >> 4) & 0xff, (wp & 0x0f) << 4)
    flush()
    val payload = toks.toByteArray
    val out = new Array[Byte](16 + payload.length)
    def le32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(0, out.length - 4L) // COMPSIZE excludes its own field
    le32(4, data.length.toLong)
    le32(8, 0x75465a4cL) // "LZFu"
    le32(12, crc(payload, 0, payload.length))
    System.arraycopy(payload, 0, out, 16, payload.length)
    out
  }
}
