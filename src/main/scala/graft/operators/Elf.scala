package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ELF binary triage (the public elf(5) / System V gABI layout) —
  * executables and objects leak into every crawl and code corpus,
  * and the curation decision (drop, or route to a binary-analysis
  * tier) needs the header facts without executing anything: class,
  * endianness, object type, machine, section census, and whether a
  * PT_INTERP program header marks it a dynamically-linked
  * executable.
  *
  * Both classes (32/64) and both byte orders parse through the
  * same reader, keyed off e_ident. Section names resolve through
  * the e_shstrndx string table, bounds-checked; SHN_UNDEF string
  * tables or truncated tables degrade names to "" rather than
  * refusing the file (the header facts stay useful — real stripped
  * or sstrip'd binaries do this).
  *
  * Pinning: ElfSpec asserts the committed gcc-produced fixtures
  * (PIE executable, relocatable object, shared library) parse to
  * the exact facts `readelf -h/-S` reports — recorded at
  * generation time; the in-repo writer round-trips the oracle's
  * planted values.
  *
  * Totality: None on damage; bounds everywhere. Scale: per-value,
  * map-only, header+tables only — never section payloads.
  */
object Elf {

  private val MaxSections = 65000

  final case class ElfMeta(is64: Boolean, littleEndian: Boolean,
      eType: String, machine: String, nSections: Int,
      sectionNames: Seq[String], hasInterp: Boolean,
      interp: String)

  private val Types = Map(1 -> "REL", 2 -> "EXEC", 3 -> "DYN",
    4 -> "CORE")
  private val Machines = Map(3 -> "x86", 8 -> "mips", 20 -> "ppc",
    40 -> "arm", 62 -> "x86_64", 183 -> "aarch64", 243 -> "riscv")

  def elfMeta(b: Array[Byte]): Option[ElfMeta] =
    try elfMeta0(b)
    catch { // totality: damage refuses, never crashes
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def elfMeta0(b: Array[Byte]): Option[ElfMeta] = {
    if (b == null || b.length < 52) return None
    if (!(b(0) == 0x7f && b(1) == 'E' && b(2) == 'L' &&
      b(3) == 'F')) return None
    val cls = b(4) & 0xff
    val data = b(5) & 0xff
    if ((cls != 1 && cls != 2) || (data != 1 && data != 2))
      return None
    val is64 = cls == 2
    val le = data == 1
    if (is64 && b.length < 64) return None
    def u16(o: Int): Int =
      if (o + 2 > b.length) return -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def u64(o: Int): Long =
      if (o + 8 > b.length) -1L
      else if (le) u32(o) | (u32(o + 4) << 32)
      else (u32(o) << 32) | u32(o + 4)

    val eType = u16(16)
    val machine = u16(18)
    if (eType < 0 || machine < 0) return None
    val (phOff, phEntSize, phNum, shOff, shEntSize, shNum,
      shStrNdx) =
      if (is64) (u64(32), u16(54), u16(56), u64(40), u16(58),
        u16(60), u16(62))
      else (u32(28), u16(42), u16(44), u32(32), u16(46), u16(48),
        u16(50))
    if (phNum < 0 || shNum < 0 || shNum > MaxSections) return None

    // sections
    val names = Seq.newBuilder[String]
    var n = 0
    if (shOff > 0 && shNum > 0) {
      val minEnt = if (is64) 64 else 40
      if (shEntSize < minEnt ||
        shOff + shEntSize.toLong * shNum > b.length) return None
      // the section-name string table
      var strFrom = -1L
      var strSize = 0L
      if (shStrNdx > 0 && shStrNdx < shNum) {
        val so = shOff + shEntSize.toLong * shStrNdx
        val (o2, s2) =
          if (is64) (u64(so.toInt + 24), u64(so.toInt + 32))
          else (u32(so.toInt + 16), u32(so.toInt + 20))
        if (o2 >= 0 && s2 >= 0 && o2 + s2 <= b.length) {
          strFrom = o2; strSize = s2
        }
      }
      def nameAt(off: Long): String = {
        if (strFrom < 0 || off < 0 || off >= strSize) return ""
        var e = (strFrom + off).toInt
        val lim = (strFrom + strSize).toInt
        while (e < lim && b(e) != 0) e += 1
        new String(b, (strFrom + off).toInt,
          e - (strFrom + off).toInt,
          java.nio.charset.StandardCharsets.US_ASCII)
      }
      var i = 0
      while (i < shNum) {
        val so = (shOff + shEntSize.toLong * i).toInt
        val nameOff = u32(so)
        // skip the SHN_UNDEF null section in the census
        if (i > 0) {
          names += nameAt(nameOff)
          n += 1
        }
        i += 1
      }
    }
    // PT_INTERP
    var interp = ""
    if (phOff > 0 && phNum > 0) {
      val minEnt = if (is64) 56 else 32
      if (phEntSize < minEnt ||
        phOff + phEntSize.toLong * phNum > b.length) return None
      var i = 0
      while (i < phNum && interp.isEmpty) {
        val po = (phOff + phEntSize.toLong * i).toInt
        val pType = u32(po)
        if (pType == 3L) { // PT_INTERP
          val (off, sz) =
            if (is64) (u64(po + 8), u64(po + 32))
            else (u32(po + 4), u32(po + 16))
          if (off >= 0 && sz > 0 && sz < 4096 &&
            off + sz <= b.length) {
            var e = (off + sz).toInt
            if (b(e - 1) == 0) e -= 1
            interp = new String(b, off.toInt, e - off.toInt,
              java.nio.charset.StandardCharsets.US_ASCII)
          }
        }
        i += 1
      }
    }
    Some(ElfMeta(is64, le,
      Types.getOrElse(eType, s"type$eType"),
      Machines.getOrElse(machine, s"machine$machine"),
      n, names.result(), interp.nonEmpty, interp))
  }

  // ---------------------------------------------------------------
  // writer: a minimal relocatable object (64/32, LE) with planted
  // named sections — enough to round-trip the triage facts
  // ---------------------------------------------------------------

  def elfWrite(is64: Boolean, machine: Int,
      sections: Seq[String]): Array[Byte] = {
    val names = "" +: sections :+ ".shstrtab"
    val strtab = new java.io.ByteArrayOutputStream()
    val nameOff = names.map { nm =>
      val off = strtab.size()
      strtab.write(nm.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      strtab.write(0)
      off
    }
    val str = strtab.toByteArray
    val ehSize = if (is64) 64 else 52
    val shEnt = if (is64) 64 else 40
    val nSh = names.length
    val strOff = ehSize
    val shOff = strOff + str.length
    val total = shOff + shEnt * nSh
    val b = new Array[Byte](total)
    def w16(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      w16(o, (v & 0xffff).toInt)
      w16(o + 2, ((v >> 16) & 0xffff).toInt)
    }
    def w64(o: Int, v: Long): Unit = { w32(o, v); w32(o + 4, v >> 32) }
    b(0) = 0x7f; b(1) = 'E'; b(2) = 'L'; b(3) = 'F'
    b(4) = if (is64) 2 else 1
    b(5) = 1 // little-endian
    b(6) = 1 // version
    w16(16, 1) // ET_REL
    w16(18, machine)
    w32(20, 1L)
    if (is64) {
      w64(40, shOff.toLong)
      w16(52, 64); w16(58, 64)
      w16(60, nSh); w16(62, nSh - 1)
    } else {
      w32(32, shOff.toLong)
      w16(40, 52); w16(46, 40)
      w16(48, nSh); w16(50, nSh - 1)
    }
    System.arraycopy(str, 0, b, strOff, str.length)
    for (i <- 0 until nSh) {
      val so = shOff + shEnt * i
      if (i > 0) {
        w32(so, nameOff(i).toLong) // sh_name
        w32(so + 4, if (i == nSh - 1) 3L else 1L) // STRTAB/PROGBITS
        if (is64) {
          if (i == nSh - 1) {
            w64(so + 24, strOff.toLong); w64(so + 32, str.length.toLong)
          }
        } else {
          if (i == nSh - 1) {
            w32(so + 16, strOff.toLong); w32(so + 20, str.length.toLong)
          }
        }
      }
    }
    b
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val elfSchema: StructType = StructType(Seq(
    StructField("is64", BooleanType),
    StructField("e_type", StringType),
    StructField("machine", StringType),
    StructField("n_sections", IntegerType),
    StructField("section_names", StringType)))

  def decodeElf(bytes: Array[Byte]): Seq[Any] =
    elfMeta(bytes) match {
      case Some(m) => Seq[Any](m.is64, m.eType, m.machine,
        m.nSections, m.sectionNames.mkString(","))
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-row synth: planted class/machine/sections cycling. */
  def synthElfs(df: DataFrame, idCol: String, nCol: String,
      outCol: String): DataFrame = {
    val (ii, ni) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val n = r.getInt(ni)
        val machine = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => 62 // x86_64
          case 1 => 183 // aarch64
          case _ => 243 // riscv
        }
        val bytes = elfWrite(is64 = id % 2 == 0, machine,
          (0 until n).map(j => s".sec$j"))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
