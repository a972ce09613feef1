package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Mach-O triage (C241) — the macOS/iOS half of the executable
  * matrix, next to C220 ELF, C223 PE, C222 .class and C221 wasm.
  * The layout is public (Apple's loader.h / the Mach-O ABI): a
  * magic in file byte order (FEEDFACE/FEEDFACF big-endian,
  * CEFAEDFE/CFFAEDFE little-endian), cputype/filetype words, then
  * `ncmds` load commands each led by (cmd, cmdsize).
  *
  * FAT/universal binaries open with the BIG-endian 0xCAFEBABE —
  * the SAME four bytes every Java .class starts with. The public
  * disambiguation (file(1)'s rule) is the next word: a FAT header
  * reads it as nfat_arch (tiny — real fat files carry 2-3 slices),
  * a class file as minor<<16|major where major ≥ 45 for every JVM
  * ever shipped. We demand nfat_arch < 30 AND every slice header
  * parse before classifying fat; otherwise the bytes stay a class.
  *
  * Surfaced: container (thin/fat), word size, cputype, filetype,
  * load-command and segment counts, linked dylib paths, UUID
  * presence; for fat, the arch list and slice count, with the
  * first slice's facts. No Apple toolchain or BFD Mach-O backend
  * exists in this environment (probe recorded: objdump lists no
  * mach-o targets), so fixtures are spec-built — the HEIF
  * precedent — and the writer round-trips.
  *
  * Totality: None on damage; all bounds checked. Scale: header +
  * load commands only, map-only.
  */
object MachO {

  private val MaxCmds = 10000
  private val MaxArchs = 30

  val CpuNames: Map[Int, String] = Map(
    7 -> "x86", 0x01000007 -> "x86_64", 12 -> "arm",
    0x0100000C -> "arm64", 18 -> "ppc", 0x01000012 -> "ppc64")

  val FileTypes: Map[Int, String] = Map(
    1 -> "object", 2 -> "execute", 3 -> "fvmlib", 4 -> "core",
    5 -> "preload", 6 -> "dylib", 7 -> "dylinker", 8 -> "bundle",
    9 -> "dylib_stub", 10 -> "dsym", 11 -> "kext")

  final case class MachMeta(container: String, is64: Boolean,
      cpu: String, fileType: String, nCmds: Int, nSegments: Int,
      dylibs: Seq[String], hasUuid: Boolean, nArchs: Int,
      archs: Seq[String])

  private final case class MFail() extends RuntimeException

  private def u32(b: Array[Byte], o: Int, be: Boolean): Long = {
    if (o < 0 || o + 4 > b.length) throw MFail()
    if (be)
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    else
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** Parse one THIN Mach-O starting at `off`. */
  private def thin(b: Array[Byte], off: Int): MachMeta = {
    val m = u32(b, off, be = true)
    val (is64, be) = m match {
      case 0xFEEDFACEL => (false, true)
      case 0xFEEDFACFL => (true, true)
      case 0xCEFAEDFEL => (false, false)
      case 0xCFFAEDFEL => (true, false)
      case _ => throw MFail()
    }
    val cpu = u32(b, off + 4, be).toInt
    val fileType = u32(b, off + 12, be).toInt
    val nCmds = u32(b, off + 16, be).toInt
    val sizeOfCmds = u32(b, off + 20, be)
    if (nCmds < 0 || nCmds > MaxCmds || sizeOfCmds < 0 ||
      sizeOfCmds > b.length - off) throw MFail()
    var p = off + (if (is64) 32 else 28)
    val end = p + sizeOfCmds.toInt
    if (end > b.length) throw MFail()
    var nSegs = 0
    var hasUuid = false
    val dylibs = Seq.newBuilder[String]
    var i = 0
    while (i < nCmds) {
      if (p + 8 > end) throw MFail()
      val cmd = u32(b, p, be)
      val cmdSize = u32(b, p + 4, be).toInt
      if (cmdSize < 8 || p + cmdSize > end) throw MFail()
      cmd match {
        case 0x1L | 0x19L => nSegs += 1 // LC_SEGMENT / _64
        case 0xcL | 0xdL | 0x18L => // LC_LOAD/ID/WEAK_DYLIB
          val nameOff = u32(b, p + 8, be).toInt
          if (nameOff < 0 || nameOff >= cmdSize) throw MFail()
          var q = p + nameOff
          val stop = p + cmdSize
          val sb = new StringBuilder
          while (q < stop && b(q) != 0) {
            sb.append((b(q) & 0xff).toChar)
            q += 1
          }
          dylibs += sb.toString
        case 0x1bL => hasUuid = true // LC_UUID
        case _ => ()
      }
      p += cmdSize
      i += 1
    }
    MachMeta("thin", is64, CpuNames.getOrElse(cpu, s"cpu$cpu"),
      FileTypes.getOrElse(fileType, s"ft$fileType"), nCmds, nSegs,
      dylibs.result(), hasUuid, 0, Seq.empty)
  }

  /** Parse one Mach-O (thin or fat). None on damage — including
    * CAFEBABE bytes that are really a Java class.
    */
  def machMeta(b: Array[Byte]): Option[MachMeta] = {
    if (b == null || b.length < 28) return None
    try {
      val m = u32(b, 0, be = true)
      if (m == 0xCAFEBABEL) {
        // fat vs Java class: nfat_arch must be tiny and every
        // slice must parse as a thin Mach-O
        val nArchs = u32(b, 4, be = true).toInt
        if (nArchs <= 0 || nArchs >= MaxArchs) return None
        val archs = Seq.newBuilder[String]
        var first: MachMeta = null
        var i = 0
        while (i < nArchs) {
          val at = 8 + 20 * i
          val cpu = u32(b, at, be = true).toInt
          val off = u32(b, at + 8, be = true)
          val size = u32(b, at + 12, be = true)
          if (off < 0 || size < 28 || off + size > b.length)
            return None
          archs += CpuNames.getOrElse(cpu, s"cpu$cpu")
          val sliceMeta = thin(b, off.toInt)
          if (first == null) first = sliceMeta
          i += 1
        }
        Some(first.copy(container = "fat", nArchs = nArchs,
          archs = archs.result()))
      } else Some(thin(b, 0))
    } catch {
      case _: MFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth): spec-built thin + fat
  // ---------------------------------------------------------------

  final class W(be: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): W = {
      if (be) {
        out.write(((v >> 24) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt)
        out.write((v & 0xff).toInt)
      } else {
        out.write((v & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 24) & 0xff).toInt)
      }
      this
    }
    def raw(bs: Array[Byte]): W = { out.write(bs); this }
    def pad(n: Int): W = { (0 until n).foreach(_ => out.write(0)); this }
  }

  /** A minimal 64-bit thin Mach-O: nSegs empty segments, the given
    * dylibs, an LC_UUID. Little-endian (the on-disk norm).
    */
  def machWrite(cpu: Int, fileType: Int, nSegs: Int,
      dylibs: Seq[String]): Array[Byte] = {
    val cmds = new W(false)
    (0 until nSegs).foreach { s =>
      // LC_SEGMENT_64: 72 bytes, zero sections
      cmds.u32(0x19L).u32(72L)
      val name = s"__SEG$s".getBytes("US-ASCII")
      cmds.raw(java.util.Arrays.copyOf(name, 16))
      cmds.pad(72 - 8 - 16)
    }
    dylibs.foreach { d =>
      val nb = d.getBytes("UTF-8")
      val size = (24 + nb.length + 1 + 7) / 8 * 8
      cmds.u32(0xcL).u32(size.toLong).u32(24L) // name offset
      cmds.u32(0L).u32(0L).u32(0L) // timestamp, versions
      cmds.raw(nb)
      cmds.pad(size - 24 - nb.length)
    }
    cmds.u32(0x1bL).u32(24L).pad(16) // LC_UUID
    val body = cmds.out.toByteArray
    val h = new W(false)
    // MH_MAGIC_64 in the file's (little-endian) byte order: the
    // LE writer emits 0xFEEDFACF as the on-disk CF FA ED FE
    h.u32(0xFEEDFACFL)
    h.u32(cpu.toLong).u32(0L)
    h.u32(fileType.toLong)
    h.u32((nSegs + dylibs.length + 1).toLong)
    h.u32(body.length.toLong)
    h.u32(0L).u32(0L) // flags, reserved
    h.raw(body)
    h.out.toByteArray
  }

  /** A fat wrapper (big-endian header) over the given slices. */
  def fatWrite(slices: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val w = new W(true)
    w.u32(0xCAFEBABEL)
    w.u32(slices.length.toLong)
    var off = 8 + 20 * slices.length
    slices.foreach { case (cpu, body) =>
      w.u32(cpu.toLong).u32(0L)
      w.u32(off.toLong).u32(body.length.toLong).u32(2L)
      off += body.length
    }
    slices.foreach { case (_, body) => w.raw(body) }
    w.out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val machSchema: StructType = StructType(Seq(
    StructField("container", StringType),
    StructField("is64", BooleanType),
    StructField("cpu", StringType),
    StructField("file_type", StringType),
    StructField("n_cmds", IntegerType),
    StructField("n_segments", IntegerType),
    StructField("dylibs", StringType),
    StructField("has_uuid", BooleanType),
    StructField("n_archs", IntegerType),
    StructField("archs", StringType)))

  def decodeMach(bytes: Array[Byte]): Seq[Any] =
    machMeta(bytes) match {
      case Some(m) => Seq[Any](m.container, m.is64, m.cpu,
        m.fileType, m.nCmds, m.nSegments, m.dylibs.mkString(","),
        m.hasUuid, m.nArchs, m.archs.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null,
        null, null, null, null)
    }

  /** Per-doc synth: thin executables/dylibs cycling cpu and
    * dylib counts; every third doc a two-arch fat binary.
    */
  def synthMachs(df: DataFrame, idCol: String, outCol: String)
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
        val nSegs = (id % 3 + 1).toInt
        val nDylibs = (id % 2 + 1).toInt
        val dylibs = (0 until nDylibs)
          .map(j => s"/usr/lib/libfix$j.dylib")
        val cpu = if (id % 2 == 0) 0x01000007 else 0x0100000C
        val fileType = if (id % 5 == 0) 6 else 2
        val bytes =
          if (java.lang.Math.floorMod(id, 3L) == 0L)
            fatWrite(Seq(
              (0x01000007, machWrite(0x01000007, fileType, nSegs,
                dylibs)),
              (0x0100000C, machWrite(0x0100000C, fileType, nSegs,
                dylibs))))
          else machWrite(cpu, fileType, nSegs, dylibs)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
