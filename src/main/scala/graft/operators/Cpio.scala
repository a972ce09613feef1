package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** cpio archive walk, both surviving ASCII dialects (the POSIX.1
  * `odc` portable format, magic `070707`, all-octal 76-byte
  * headers; and the SVR4 `newc` format, magic `070701`, all-hex
  * 110-byte headers with 4-byte alignment — plus its `070702` CRC
  * variant, whose per-file checksum — the 32-bit sum of data
  * bytes — is VERIFIED, not ignored). The initramfs/rpm payload
  * format.
  *
  * Ends at the `TRAILER!!!` entry; a stream without it refuses
  * (torn archives must not pass as complete). Hard-link data
  * sharing is left as stored (size-0 bodies list with size 0, the
  * convention newc uses for all but the last link).
  *
  * Pinning: CpioSpec fixtures are written by libarchive's bsdtar in
  * both dialects; our writer's archives extract there byte-exactly
  * (CpioPinGen records the recipe).
  *
  * Totality: None on damage; bomb guards; never throws. Scale: the
  * walk is per-value and map-only.
  */
object Cpio {

  private val MaxMember = 64 << 20
  private val MaxMembers = 100000

  final case class CpioEntry(name: String, size: Long, mode: Long,
      mtime: Long, format: String, data: Array[Byte])

  private def field(b: Array[Byte], off: Int, len: Int, radix: Int)
      : Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (radix == 16 && c >= 'a' && c <= 'f') c - 'a' + 10
        else if (radix == 16 && c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1L
      if (radix == 8 && d > 7) return -1L
      v = v * radix + d
      if (v > Int.MaxValue.toLong * 2) return -1L
      i += 1
    }
    v
  }

  /** Walk a cpio archive (odc and/or newc members may be mixed —
    * each header re-sniffs its magic). None without the trailer.
    */
  def cpioEntries(b: Array[Byte]): Option[Seq[CpioEntry]] = {
    if (b == null || b.length < 76) return None
    val out = Seq.newBuilder[CpioEntry]
    var p = 0
    var n = 0
    while (true) {
      if (p + 6 > b.length) return None
      val magic = new String(b, p, 6,
        java.nio.charset.StandardCharsets.US_ASCII)
      magic match {
        case "070707" => // odc: octal fields
          if (p + 76 > b.length) return None
          val mode = field(b, p + 18, 6, 8)
          val mtime = field(b, p + 48, 11, 8)
          val nameSize = field(b, p + 59, 6, 8)
          val fileSize = field(b, p + 65, 11, 8)
          if (mode < 0 || mtime < 0 || nameSize <= 0 ||
            fileSize < 0 || fileSize > MaxMember) return None
          val nameOff = p + 76
          if (nameOff + nameSize > b.length) return None
          val name = new String(b, nameOff, nameSize.toInt - 1,
            java.nio.charset.StandardCharsets.UTF_8)
          if (b(nameOff + nameSize.toInt - 1) != 0) return None
          val dataOff = nameOff + nameSize.toInt
          if (dataOff + fileSize > b.length) return None
          if (name == "TRAILER!!!") return Some(out.result())
          out += CpioEntry(name, fileSize, mode, mtime, "odc",
            java.util.Arrays.copyOfRange(b, dataOff,
              dataOff + fileSize.toInt))
          p = dataOff + fileSize.toInt
        case "070701" | "070702" => // newc: hex fields, 4-aligned
          if (p + 110 > b.length) return None
          val mode = field(b, p + 14, 8, 16)
          val mtime = field(b, p + 46, 8, 16)
          val fileSize = field(b, p + 54, 8, 16)
          val nameSize = field(b, p + 94, 8, 16)
          val check = field(b, p + 102, 8, 16)
          if (mode < 0 || mtime < 0 || nameSize <= 0 ||
            fileSize < 0 || fileSize > MaxMember ||
            check < 0) return None
          val nameOff = p + 110
          if (nameOff + nameSize > b.length) return None
          val name = new String(b, nameOff, nameSize.toInt - 1,
            java.nio.charset.StandardCharsets.UTF_8)
          if (b(nameOff + nameSize.toInt - 1) != 0) return None
          // header+name padded to a multiple of 4
          val dataOff = (nameOff + nameSize.toInt + 3) & ~3
          if (dataOff + fileSize > b.length) return None
          if (name == "TRAILER!!!") return Some(out.result())
          if (magic == "070702") { // CRC dialect: verify the sum
            var sum = 0L
            var i = dataOff
            val end = dataOff + fileSize.toInt
            while (i < end) { sum += (b(i) & 0xff); i += 1 }
            if ((sum & 0xffffffffL) != check) return None
          }
          out += CpioEntry(name, fileSize, mode, mtime,
            if (magic == "070702") "crc" else "newc",
            java.util.Arrays.copyOfRange(b, dataOff,
              dataOff + fileSize.toInt))
          p = (dataOff + fileSize.toInt + 3) & ~3
        case _ => return None
      }
      n += 1
      if (n > MaxMembers) return None
    }
    None // unreachable
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  /** Write a cpio archive: format 0 = odc, 1 = newc, 2 = newc-CRC.
    * Regular files, mode 0100644, deterministic zero mtime.
    */
  def cpioWrite(members: Seq[(String, Array[Byte])], format: Int)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def oct(v: Long, w: Int): String = {
      val s = java.lang.Long.toOctalString(v)
      ("0" * (w - s.length)) + s
    }
    def hex(v: Long, w: Int): String = {
      val s = java.lang.Long.toHexString(v)
      ("0" * (w - s.length)) + s
    }
    def padTo4(): Unit = while ((out.size & 3) != 0) out.write(0)
    def entry(name: String, data: Array[Byte], mode: Long,
        nlink: Int): Unit = {
      val nameZ = name.length + 1
      if (format == 0) {
        put("070707")
        put(oct(0, 6)); put(oct(1, 6)) // dev, ino
        put(oct(mode, 6))
        put(oct(0, 6)); put(oct(0, 6)) // uid, gid
        put(oct(nlink, 6)); put(oct(0, 6)) // nlink, rdev
        put(oct(0, 11)) // mtime
        put(oct(nameZ, 6))
        put(oct(data.length, 11))
        put(name); out.write(0)
        out.write(data, 0, data.length)
      } else {
        var sum = 0L
        if (format == 2) data.foreach(c => sum += (c & 0xff))
        put(if (format == 2) "070702" else "070701")
        put(hex(1, 8)) // ino
        put(hex(mode, 8))
        put(hex(0, 8)); put(hex(0, 8)) // uid, gid
        put(hex(nlink, 8)); put(hex(0, 8)) // nlink, mtime
        put(hex(data.length, 8))
        put(hex(0, 8)); put(hex(0, 8)) // devmajor/minor
        put(hex(0, 8)); put(hex(0, 8)) // rdevmajor/minor
        put(hex(nameZ, 8))
        put(hex(sum & 0xffffffffL, 8)) // check (0 unless CRC)
        put(name); out.write(0)
        padTo4()
        out.write(data, 0, data.length)
        padTo4()
      }
    }
    members.foreach { case (nm, d) => entry(nm, d, 0x81a4L, 1) }
    entry("TRAILER!!!", Array.emptyByteArray, 0L, 1)
    // archives are conventionally padded to a 512-byte block
    while ((out.size & 511) != 0) out.write(0)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  /** Per-row synth: `n` planted members, dialect cycling by id
    * (odc / newc / newc-CRC).
    */
  def synthCpios(df: DataFrame, idCol: String, textCol: String,
      nCol: String, outCol: String): DataFrame = {
    val (ii, ti, ni) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val n = r.getInt(ni)
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val bytes = cpioWrite((0 until n).map(j =>
          (s"p$j.dat", (s"c$j:" + text).getBytes("UTF-8"))),
          java.lang.Math.floorMod(id, 3L).toInt)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** One row per member with the dialect and extraction verified. */
  def cpioEntryRows(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("entry_name", StringType),
      StructField("format", StringType),
      StructField("u_size", LongType),
      StructField("ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        cpioEntries(r.getAs[Array[Byte]](ci)).toSeq.flatten.map(e =>
          Row(id, e.name, e.format, e.size,
            e.data.length.toLong == e.size))
      }
    }(enc)
  }
}
