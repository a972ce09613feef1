package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** RAR5 archive walk (the public rarlab format documentation and
  * unrar sources define the layout; libarchive carries an
  * independent reader). Blocks are `crc32 ++ vint(headerSize) ++
  * header`, where the CRC covers the size vint and the header; a
  * file header carries vint-coded flags/sizes/attributes, optional
  * mtime and data-CRC fields, compression info (method bits 7..9),
  * host OS and a UTF-8 name, then `dataSize` bytes of payload.
  *
  * Scope is the honest tier reachable without RAR's proprietary-
  * restricted compressor: STORED (method 0) members list and
  * extract with their data CRC32 verified; compressed members list
  * with sizes and method but extraction refuses (`data = None`) —
  * the same per-member refusal contract the 7z walk uses for its
  * unsupported coders. Encrypted headers refuse outright.
  *
  * Pinning: rar/unrar binaries do not exist in this environment
  * (probed; recorded), so fixtures cannot come from the reference
  * writer. Instead the pin runs the OTHER direction against an
  * independent implementation: the in-repo from-spec writer's
  * archives are listed and extracted byte-exactly by libarchive's
  * bsdtar rar5 reader (RarPinGen records the run), which pins the
  * writer, and the round-trip pins the walk against the writer.
  *
  * Totality: None on structural damage; CRC lies refuse the
  * member; bomb guards. Scale: per-value, map-only.
  */
object Rar {

  private val MaxMember = 64 << 20
  private val MaxMembers = 100000

  val Signature: Array[Byte] = Array[Byte](0x52, 0x61, 0x72, 0x21,
    0x1a, 0x07, 0x01, 0x00)

  final case class RarEntry(name: String, size: Long, method: Int,
      isDir: Boolean, data: Option[Array[Byte]])

  private final case class RarFail() extends RuntimeException

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, from, until - from)
    c.getValue
  }

  /** vint: 7 bits per byte LSB-first, high bit = continuation. */
  private def vint(b: Array[Byte], p0: Int): (Long, Int) = {
    var v = 0L
    var p = p0
    var shift = 0
    while (true) {
      if (p >= b.length || shift > 63) throw RarFail()
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return (v, p)
      shift += 7
    }
    (0L, p0) // unreachable
  }

  /** Walk a RAR5 archive. None on damage or a RAR4/SFX payload. */
  def rarEntries(b: Array[Byte]): Option[Seq[RarEntry]] = {
    if (b == null || b.length < Signature.length + 7) return None
    var i = 0
    while (i < Signature.length) {
      if (b(i) != Signature(i)) return None
      i += 1
    }
    try {
      val out = Seq.newBuilder[RarEntry]
      var p = Signature.length
      var n = 0
      var sawEnd = false
      while (!sawEnd && p < b.length) {
        if (p + 5 > b.length) throw RarFail()
        val storedCrc = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
        val (hdrSize, afterSize) = vint(b, p + 4)
        if (hdrSize <= 0 || hdrSize > b.length - afterSize)
          throw RarFail()
        val hdrEnd = afterSize + hdrSize.toInt
        if (crc32(b, p + 4, hdrEnd) != storedCrc) throw RarFail()
        val (typ, p1) = vint(b, afterSize)
        val (flags, p2) = vint(b, p1)
        var q = p2
        var extraSize = 0L
        var dataSize = 0L
        if ((flags & 0x01) != 0) {
          val (e, qq) = vint(b, q); extraSize = e; q = qq
        }
        if ((flags & 0x02) != 0) {
          val (d, qq) = vint(b, q); dataSize = d; q = qq
        }
        if (extraSize < 0 || dataSize < 0 ||
          dataSize > b.length - hdrEnd) throw RarFail()
        typ match {
          case 2 | 3 => // file / service header
            val (fileFlags, f1) = vint(b, q)
            val (unpSize, f2) = vint(b, f1)
            val (_, f3) = vint(b, f2) // attributes
            var r = f3
            if ((fileFlags & 0x02) != 0) r += 4 // mtime
            var dataCrc = -1L
            if ((fileFlags & 0x04) != 0) {
              if (r + 4 > hdrEnd) throw RarFail()
              dataCrc = (b(r) & 0xffL) | ((b(r + 1) & 0xffL) << 8) |
                ((b(r + 2) & 0xffL) << 16) |
                ((b(r + 3) & 0xffL) << 24)
              r += 4
            }
            val (compInfo, f4) = vint(b, r)
            val (_, f5) = vint(b, f4) // host os
            val (nameLen, f6) = vint(b, f5)
            if (nameLen <= 0 || nameLen > 4096 ||
              f6 + nameLen > hdrEnd) throw RarFail()
            val name = new String(b, f6, nameLen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            val isDir = (fileFlags & 0x01) != 0
            val method = ((compInfo >> 7) & 0x07).toInt
            if (typ == 2) { // service headers are not corpus files
              if (unpSize > MaxMember) throw RarFail()
              val data =
                if (isDir) Some(Array.emptyByteArray)
                else if (method == 0) {
                  if (dataSize != unpSize) throw RarFail()
                  val d = java.util.Arrays.copyOfRange(b, hdrEnd,
                    hdrEnd + dataSize.toInt)
                  if (dataCrc >= 0 &&
                    crc32(d, 0, d.length) != dataCrc) None
                  else Some(d)
                } else None // compressed: honest refusal
              out += RarEntry(name, unpSize, method, isDir, data)
              n += 1
              if (n > MaxMembers) throw RarFail()
            }
          case 5 => sawEnd = true
          case _ => () // main/encryption/unknown: skip by sizes
        }
        p = hdrEnd + dataSize.toInt
      }
      if (!sawEnd) return None // torn archive must not pass
      Some(out.result())
    } catch {
      case _: RarFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (stored members — the spec's block grammar end to end)
  // ---------------------------------------------------------------

  private def vintBytes(v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(10)
    var x = v
    do {
      val part = (x & 0x7f).toInt
      x >>>= 7
      out.write(if (x != 0) part | 0x80 else part)
    } while (x != 0)
    out.toByteArray
  }

  private def block(typ: Long, flags: Long, body: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(vintBytes(typ))
    hdr.write(vintBytes(flags))
    if ((flags & 0x02) != 0) hdr.write(vintBytes(data.length.toLong))
    hdr.write(body)
    val h = hdr.toByteArray
    val sz = vintBytes(h.length.toLong)
    val crcBuf = sz ++ h
    val c = new java.util.zip.CRC32()
    c.update(crcBuf, 0, crcBuf.length)
    val crc = c.getValue
    val out = new java.io.ByteArrayOutputStream()
    out.write((crc & 0xff).toInt); out.write(((crc >> 8) & 0xff).toInt)
    out.write(((crc >> 16) & 0xff).toInt)
    out.write(((crc >> 24) & 0xff).toInt)
    out.write(crcBuf, 0, crcBuf.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** Write a stored-only RAR5. */
  def rarWrite(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    // main archive header: type 1, no flags, archive_flags vint 0
    val main = block(1, 0, vintBytes(0), Array.emptyByteArray)
    out.write(main, 0, main.length)
    for ((name, data) <- members) {
      val nm = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val c = new java.util.zip.CRC32()
      c.update(data, 0, data.length)
      val body = new java.io.ByteArrayOutputStream()
      body.write(vintBytes(0x04)) // file flags: data CRC present
      body.write(vintBytes(data.length.toLong)) // unpacked size
      body.write(vintBytes(0x20)) // attributes (archive bit)
      val crc = c.getValue
      body.write((crc & 0xff).toInt)
      body.write(((crc >> 8) & 0xff).toInt)
      body.write(((crc >> 16) & 0xff).toInt)
      body.write(((crc >> 24) & 0xff).toInt)
      body.write(vintBytes(0)) // compression info: v0, store
      body.write(vintBytes(0)) // host os: windows(0)
      body.write(vintBytes(nm.length.toLong))
      body.write(nm, 0, nm.length)
      val blk = block(2, 0x02, body.toByteArray, data)
      out.write(blk, 0, blk.length)
    }
    val end = block(5, 0, vintBytes(0), Array.emptyByteArray)
    out.write(end, 0, end.length)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  /** Per-row synth: `n` stored members with planted names/text. */
  def synthRars(df: DataFrame, idCol: String, textCol: String,
      nCol: String, outCol: String): DataFrame = {
    val (ti, ni) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val nMembers = r.getInt(ni)
        val bytes = rarWrite((0 until nMembers).map(j =>
          (s"r$j.txt", (s"v$j:" + text).getBytes("UTF-8"))))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** One row per member with CRC-verified extraction. */
  def rarEntryRows(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("entry_name", StringType),
      StructField("method", IntegerType),
      StructField("u_size", LongType),
      StructField("ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        rarEntries(r.getAs[Array[Byte]](ci)).toSeq.flatten
          .filter(!_.isDir).map(e =>
            Row(id, e.name, e.method, e.size,
              e.data.exists(_.length.toLong == e.size)))
      }
    }(enc)
  }
}
