package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** RPM package triage (C243) — one of the two big Linux package
  * formats (the other, deb, is C209); distro mirrors and vendor
  * drops fill lakes with these. The layout is public (the rpm.org
  * / LSB package-format spec): a 96-byte LEAD (magic, type, name),
  * a SIGNATURE header, 8-byte alignment padding, the MAIN header
  * — both headers the same tag-entry structure (magic 8E AD E8 01,
  * big-endian index/data sizes, 16-byte entries of tag/type/
  * offset/count) — then the payload: a cpio(newc) archive
  * compressed with the compressor the header itself declares.
  *
  * Surfaced: package name/version/release/arch (the STRING tags
  * 1000/1001/1002/1022), binary-vs-source type, the declared
  * payload format + compressor (1124/1125), and the payload's
  * entry census through the HOUSE codecs — gzip, xz and zstd all
  * ride the existing reference-pinned decoders, and the cpio walk
  * is C210's. An undeclared or unsupported compressor refuses
  * honestly.
  *
  * No rpm/rpm2cpio tooling exists in this environment (probe
  * recorded), so fixtures are spec-built — the HEIF precedent —
  * and the writer round-trips.
  *
  * Totality: None on damage. Scale: per-value map-only.
  */
object Rpm {

  private val MaxIndex = 100000
  private val MaxHeader = 16 << 20

  final case class RpmMeta(name: String, version: String,
      release: String, arch: String, isSource: Boolean,
      payloadFormat: String, compressor: String, nEntries: Int,
      entryNames: Seq[String])

  private final case class RFail() extends RuntimeException

  private def be16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw RFail()
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }

  private def be32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw RFail()
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** Parse one header structure at `off`; returns (string tags,
    * end offset past the data region).
    */
  private def header(b: Array[Byte], off: Int)
      : (Map[Int, String], Int) = {
    if (off + 16 > b.length) throw RFail()
    if ((b(off) & 0xff) != 0x8e || (b(off + 1) & 0xff) != 0xad ||
      (b(off + 2) & 0xff) != 0xe8 || (b(off + 3) & 0xff) != 0x01)
      throw RFail()
    val nIndex = be32(b, off + 8)
    val hSize = be32(b, off + 12)
    if (nIndex < 0 || nIndex > MaxIndex || hSize < 0 ||
      hSize > MaxHeader) throw RFail()
    val storeAt = off + 16 + 16 * nIndex.toInt
    val end = storeAt + hSize.toInt
    if (end > b.length) throw RFail()
    val strings = Map.newBuilder[Int, String]
    var i = 0
    while (i < nIndex) {
      val e = off + 16 + 16 * i
      val tag = be32(b, e).toInt
      val typ = be32(b, e + 4).toInt
      val dOff = be32(b, e + 8)
      if (typ == 6) { // STRING: NUL-terminated in the store
        if (dOff < 0 || dOff >= hSize) throw RFail()
        var q = storeAt + dOff.toInt
        val sb = new StringBuilder
        while (q < end && b(q) != 0) {
          sb.append((b(q) & 0xff).toChar)
          q += 1
        }
        if (q >= end) throw RFail() // unterminated
        strings += tag -> sb.toString
      }
      i += 1
    }
    (strings.result(), end)
  }

  /** Parse one .rpm. None on damage. */
  def rpmMeta(b: Array[Byte]): Option[RpmMeta] = {
    if (b == null || b.length < 96 + 32) return None
    if ((b(0) & 0xff) != 0xed || (b(1) & 0xff) != 0xab ||
      (b(2) & 0xff) != 0xee || (b(3) & 0xff) != 0xdb) return None
    try {
      val isSource = be16(b, 6) == 1
      // signature header at 96, its data region padded to 8
      val (_, sigEnd) = header(b, 96)
      val mainAt = (sigEnd + 7) / 8 * 8
      val (tags, mainEnd) = header(b, mainAt)
      val name = tags.getOrElse(1000, return None)
      val version = tags.getOrElse(1001, return None)
      val release = tags.getOrElse(1002, "")
      val arch = tags.getOrElse(1022, if (isSource) "src" else "")
      val payloadFormat = tags.getOrElse(1124, "cpio")
      val compressor = tags.getOrElse(1125, "gzip")
      if (payloadFormat != "cpio") return None
      val payload = java.util.Arrays.copyOfRange(b, mainEnd,
        b.length)
      val cpio = (compressor match {
        case "gzip" => Archive.gunzip(payload)
        case "xz" => Xz.decompress(payload)
        case "zstd" => Zstd.decompress(payload)
        case _ => None // lzma/bzip2 variants refuse honestly
      }).getOrElse(return None)
      val entries = Cpio.cpioEntries(cpio).getOrElse(return None)
      Some(RpmMeta(name, version, release, arch, isSource,
        payloadFormat, compressor, entries.length,
        entries.map(_.name)))
    } catch {
      case _: RFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  private def headerWrite(tags: Seq[(Int, String)]): Array[Byte] = {
    val store = new java.io.ByteArrayOutputStream()
    val entries = tags.map { case (tag, v) =>
      val at = store.size()
      store.write(v.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      store.write(0)
      (tag, at)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt)
      out.write((v & 0xff).toInt)
    }
    out.write(0x8e); out.write(0xad); out.write(0xe8); out.write(0x01)
    w32(0L)
    w32(entries.length.toLong)
    w32(store.size().toLong)
    entries.foreach { case (tag, at) =>
      w32(tag.toLong); w32(6L); w32(at.toLong); w32(1L)
    }
    out.write(store.toByteArray)
    out.toByteArray
  }

  def rpmWrite(name: String, version: String, release: String,
      arch: String, compressor: String,
      members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // lead
    out.write(0xed); out.write(0xab); out.write(0xee); out.write(0xdb)
    out.write(3); out.write(0) // major.minor
    out.write(0); out.write(0) // type: binary
    out.write(0); out.write(1) // archnum
    val nm = name.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    out.write(java.util.Arrays.copyOf(nm, 66))
    out.write(0); out.write(1) // osnum
    out.write(0); out.write(5) // signature type
    (0 until 16).foreach(_ => out.write(0))
    // signature header (one planted SIZE-ish string tag) + pad 8
    val sig = headerWrite(Seq(269 -> "fixture-sha"))
    out.write(sig)
    val pad = (8 - (96 + sig.length) % 8) % 8
    (0 until pad).foreach(_ => out.write(0))
    // main header
    out.write(headerWrite(Seq(
      1000 -> name, 1001 -> version, 1002 -> release,
      1022 -> arch, 1124 -> "cpio", 1125 -> compressor)))
    // payload
    val cpio = Cpio.cpioWrite(members, format = 1)
    val payload = compressor match {
      case "gzip" => Archive.gzipWrite(cpio)
      case "xz" => Xz.compress(cpio)
      case "zstd" => Zstd.encodeFrame(cpio)
      case _ => cpio
    }
    out.write(payload)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val rpmSchema: StructType = StructType(Seq(
    StructField("pkg_name", StringType),
    StructField("version", StringType),
    StructField("release", StringType),
    StructField("arch", StringType),
    StructField("compressor", StringType),
    StructField("n_entries", IntegerType),
    StructField("entry_names", StringType)))

  def decodeRpm(bytes: Array[Byte]): Seq[Any] =
    rpmMeta(bytes) match {
      case Some(m) => Seq[Any](m.name, m.version, m.release,
        m.arch, m.compressor, m.nEntries,
        m.entryNames.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-doc synth: compressors cycling over the house codecs. */
  def synthRpms(df: DataFrame, idCol: String, outCol: String)
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
        val compressor = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => "gzip"
          case 1 => "xz"
          case _ => "zstd"
        }
        val n = (id % 3 + 1).toInt
        val members = (0 until n).map { j =>
          (s"./usr/share/doc/f$j",
            s"payload $id member $j".getBytes("UTF-8"))
        }
        val bytes = rpmWrite(s"pkg${id % 20}", s"1.${id % 10}",
          s"${id % 5}", if (id % 2 == 0) "x86_64" else "noarch",
          compressor, members)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
