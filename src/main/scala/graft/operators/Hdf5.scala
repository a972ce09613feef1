package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** HDF5 superblock triage (C244) — .h5 files carry model weights
  * and scientific datasets into every ML lake. Full HDF5 is a
  * filesystem-in-a-file; TRIAGE needs the superblock: identity,
  * version, address geometry, and the two integrity facts a census
  * can check without a reader — does the end-of-file address match
  * the actual length, and does the version-2/3 superblock checksum
  * verify.
  *
  * The layout is public (the HDF5 File Format Specification):
  * the 8-byte signature, then version 0/1 (v0 geometry: group
  * leaf/internal K, base / free-space / EOF / driver-info
  * addresses) or version 2/3 (offset/length sizes, flags, base /
  * extension / EOF / root-header addresses, then a Jenkins
  * LOOKUP3 checksum of the preceding superblock bytes).
  *
  * lookup3 (`hashlittle`) is implemented from Bob Jenkins' public
  * algorithm and PINNED in Hdf5Spec against the test vectors
  * published in lookup3.c itself. No h5py/pytables ships in this
  * environment (probe recorded), so file fixtures are spec-built —
  * the HEIF precedent — and the writer round-trips.
  *
  * Totality: None on damage. Scale: superblock-only map work.
  */
object Hdf5 {

  final case class H5Meta(version: Int, offsetSize: Int,
      lengthSize: Int, eofMatches: Boolean,
      checksumOk: Option[Boolean])

  /** Bob Jenkins' lookup3 hashlittle over `b[0, len)`. */
  def hashlittle(b: Array[Byte], len: Int, initval: Long): Long = {
    var a = (0xdeadbeefL + len + initval) & 0xffffffffL
    var bb = a
    var c = a
    var p = 0
    var remaining = len
    def u32(o: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def rot(x: Long, k: Int): Long =
      ((x << k) | (x >>> (32 - k))) & 0xffffffffL
    while (remaining > 12) {
      a = (a + u32(p, 4)) & 0xffffffffL
      bb = (bb + u32(p + 4, 4)) & 0xffffffffL
      c = (c + u32(p + 8, 4)) & 0xffffffffL
      // mix
      a = (a - c) & 0xffffffffL; a ^= rot(c, 4)
      c = (c + bb) & 0xffffffffL
      bb = (bb - a) & 0xffffffffL; bb ^= rot(a, 6)
      a = (a + c) & 0xffffffffL
      c = (c - bb) & 0xffffffffL; c ^= rot(bb, 8)
      bb = (bb + a) & 0xffffffffL
      a = (a - c) & 0xffffffffL; a ^= rot(c, 16)
      c = (c + bb) & 0xffffffffL
      bb = (bb - a) & 0xffffffffL; bb ^= rot(a, 19)
      a = (a + c) & 0xffffffffL
      c = (c - bb) & 0xffffffffL; c ^= rot(bb, 4)
      bb = (bb + a) & 0xffffffffL
      p += 12
      remaining -= 12
    }
    if (remaining > 0) {
      val n1 = math.min(remaining, 4)
      a = (a + u32(p, n1)) & 0xffffffffL
      if (remaining > 4) {
        val n2 = math.min(remaining - 4, 4)
        bb = (bb + u32(p + 4, n2)) & 0xffffffffL
      }
      if (remaining > 8) c = (c + u32(p + 8, remaining - 8)) &
        0xffffffffL
      // final
      c ^= bb; c = (c - rot(bb, 14)) & 0xffffffffL
      a ^= c; a = (a - rot(c, 11)) & 0xffffffffL
      bb ^= a; bb = (bb - rot(a, 25)) & 0xffffffffL
      c ^= bb; c = (c - rot(bb, 16)) & 0xffffffffL
      a ^= c; a = (a - rot(c, 4)) & 0xffffffffL
      bb ^= a; bb = (bb - rot(a, 14)) & 0xffffffffL
      c ^= bb; c = (c - rot(bb, 24)) & 0xffffffffL
    }
    c
  }

  private val Signature =
    Array[Int](0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  /** Parse one HDF5 superblock. None on damage. */
  def h5Meta(b: Array[Byte]): Option[H5Meta] = {
    if (b == null || b.length < 16) return None
    var i = 0
    while (i < 8) {
      if ((b(i) & 0xff) != Signature(i)) return None
      i += 1
    }
    def le(o: Int, n: Int): Long = {
      if (o < 0 || o + n > b.length) return -1L
      var v = 0L
      var j = 0
      while (j < n) { v |= (b(o + j) & 0xffL) << (8 * j); j += 1 }
      v
    }
    val version = b(8) & 0xff
    version match {
      case 0 | 1 =>
        if (b.length < 24) return None
        val offSize = b(13) & 0xff
        val lenSize = b(14) & 0xff
        if (offSize < 2 || offSize > 8 || lenSize < 2 ||
          lenSize > 8) return None
        // base(13+..): layout: ver(8) fs(9) root(10) rsvd(11)
        // shared(12) sizes(13,14) rsvd(15) leafK(16-17)
        // internalK(18-19) flags(20-23) then 4 addresses
        val eofAt = 24 + 2 * offSize
        val eof = le(eofAt, offSize)
        if (eof < 0) return None
        Some(H5Meta(version, offSize, lenSize,
          eof == b.length.toLong, None))
      case 2 | 3 =>
        val offSize = b(9) & 0xff
        val lenSize = b(10) & 0xff
        if (offSize < 2 || offSize > 8 || lenSize < 2 ||
          lenSize > 8) return None
        val sbLen = 12 + 4 * offSize + 4
        if (b.length < sbLen) return None
        val eof = le(12 + 2 * offSize, offSize)
        if (eof < 0) return None
        val stored = le(12 + 4 * offSize, 4)
        val computed = hashlittle(b, 12 + 4 * offSize, 0L)
        Some(H5Meta(version, offSize, lenSize,
          eof == b.length.toLong, Some(stored == computed)))
      case _ => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  /** A minimal v0 or v3 file: superblock + `body` filler bytes,
    * EOF address set to the true total length.
    */
  def h5Write(version: Int, bodyLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def le(v: Long, n: Int): Unit = {
      var j = 0
      while (j < n) { out.write(((v >> (8 * j)) & 0xff).toInt); j += 1 }
    }
    if (version == 0) {
      val total = 24 + 4 * 8 + 24 + bodyLen // sb + 4 addrs + symtab
      out.write(0) // superblock version
      out.write(0); out.write(0); out.write(0) // fs, root, rsvd
      out.write(0) // shared header version
      out.write(8); out.write(8) // sizes
      out.write(0)
      le(4L, 2); le(16L, 2) // leaf K, internal K
      le(0L, 4) // flags
      le(0L, 8) // base
      le(-1L, 8) // free-space (undefined)
      le(total.toLong, 8) // EOF
      le(-1L, 8) // driver info
      (0 until 24 + bodyLen).foreach(_ => out.write(0xee))
      out.toByteArray
    } else {
      val sbLen = 12 + 4 * 8 + 4
      val total = sbLen + bodyLen
      out.write(3)
      out.write(8); out.write(8) // sizes
      out.write(0) // flags
      le(0L, 8) // base
      le(-1L, 8) // extension (undefined)
      le(total.toLong, 8) // EOF
      le(48L, 8) // root object header
      val head = out.toByteArray
      val crc = hashlittle(head, head.length, 0L)
      le(crc, 4)
      (0 until bodyLen).foreach(_ => out.write(0xee))
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val h5Schema: StructType = StructType(Seq(
    StructField("sb_version", IntegerType),
    StructField("offset_size", IntegerType),
    StructField("length_size", IntegerType),
    StructField("eof_matches", BooleanType),
    StructField("checksum_ok", BooleanType)))

  def decodeH5(bytes: Array[Byte]): Seq[Any] =
    h5Meta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.offsetSize,
        m.lengthSize, m.eofMatches,
        m.checksumOk.map(java.lang.Boolean.valueOf).orNull)
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-doc synth: v0/v3 cycling by parity; every fifth doc a
    * TRUNCATED file whose EOF address no longer matches — the
    * integrity fact the census exists to surface.
    */
  def synthH5s(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
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
        val full = h5Write(if (id % 2 == 0) 0 else 3,
          (id % 50 + 10).toInt)
        val bytes =
          if (java.lang.Math.floorMod(id, 5L) == 0L)
            full.dropRight(5) // torn tail: EOF addr now lies
          else full
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
