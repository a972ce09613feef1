package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PE/COFF binary triage (the public Microsoft PE format spec —
  * the Windows half of the executable tier next to [[Elf]]): the
  * MZ stub's e_lfanew hop, the `PE\0\0` signature, the COFF header
  * (machine, section count, DLL/EXE characteristics), the optional
  * header's PE32 vs PE32+ magic and subsystem, and the 40-byte
  * section table with its NUL-padded 8-byte names.
  *
  * Pinning: binutils on this machine carries the BFD PE backends
  * (`pei-x86-64` et al.), so the in-repo writer's images are read
  * back by objdump — format, architecture and section list match
  * the planted values (PePinGen records the run). No Windows
  * toolchain exists here to produce a forward fixture (probe
  * recorded); the writer/walker round-trip plus the independent
  * objdump read is the strongest pin available.
  *
  * Totality: None on damage; bounds everywhere; section payloads
  * never parse. Scale: per-value, map-only.
  */
object Pe {

  private val MaxSections = 4096

  final case class PeMeta(machine: String, is64: Boolean,
      isDll: Boolean, subsystem: Int, nSections: Int,
      sectionNames: Seq[String])

  private val Machines = Map(0x014c -> "i386", 0x8664 -> "x86_64",
    0x01c0 -> "arm", 0xaa64 -> "arm64", 0x0200 -> "ia64")

  def peMeta(b: Array[Byte]): Option[PeMeta] =
    try peMeta0(b)
    catch { // totality: damage refuses, never crashes
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def peMeta0(b: Array[Byte]): Option[PeMeta] = {
    if (b == null || b.length < 0x40) return None
    if (!(b(0) == 'M' && b(1) == 'Z')) return None
    def u16(o: Int): Int =
      if (o + 2 > b.length) -1
      else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    val lfanew = u32(0x3c)
    if (lfanew < 0x40 || lfanew + 24 > b.length ||
      lfanew > Int.MaxValue) return None
    val pe = lfanew.toInt
    if (!(b(pe) == 'P' && b(pe + 1) == 'E' && b(pe + 2) == 0 &&
      b(pe + 3) == 0)) return None
    val machine = u16(pe + 4)
    val nSections = u16(pe + 6)
    val sizeOpt = u16(pe + 20)
    val characteristics = u16(pe + 22)
    if (machine < 0 || nSections < 0 || nSections > MaxSections ||
      sizeOpt < 0) return None
    var is64 = false
    var subsystem = -1
    if (sizeOpt >= 2) {
      val optMagic = u16(pe + 24)
      if (optMagic != 0x10b && optMagic != 0x20b) return None
      is64 = optMagic == 0x20b
      if (sizeOpt >= 70) subsystem = u16(pe + 24 + 68)
    } else if (nSections == 0) return None
    val secOff = pe + 24 + sizeOpt
    if (secOff + 40L * nSections > b.length) return None
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < nSections) {
      val o = secOff + 40 * i
      var e = o
      while (e < o + 8 && b(e) != 0) e += 1
      names += new String(b, o, e - o,
        java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    Some(PeMeta(Machines.getOrElse(machine, f"machine$machine%04x"),
      is64, (characteristics & 0x2000) != 0, subsystem, nSections,
      names.result()))
  }

  // ---------------------------------------------------------------
  // writer: a minimal PE32/PE32+ image objdump reads back
  // ---------------------------------------------------------------

  def peWrite(is64: Boolean, isDll: Boolean,
      sections: Seq[String]): Array[Byte] = {
    val nS = sections.length
    val optSize = if (is64) 240 else 224
    val peOff = 0x40
    val secOff = peOff + 24 + optSize
    val hdrEnd = secOff + 40 * nS
    val fileAlign = 512
    val headersSize = ((hdrEnd + fileAlign - 1) / fileAlign) *
      fileAlign
    val total = headersSize + fileAlign * nS
    val b = new Array[Byte](total)
    def w16(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte
      b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      w16(o, (v & 0xffff).toInt); w16(o + 2, ((v >> 16) & 0xffff).toInt)
    }
    b(0) = 'M'; b(1) = 'Z'
    w32(0x3c, peOff.toLong)
    b(peOff) = 'P'; b(peOff + 1) = 'E'
    w16(peOff + 4, if (is64) 0x8664 else 0x014c)
    w16(peOff + 6, nS)
    w16(peOff + 20, optSize)
    w16(peOff + 22,
      0x0002 | 0x0100 | (if (isDll) 0x2000 else 0)) // EXE|32BIT-ish
    val o = peOff + 24
    w16(o, if (is64) 0x20b else 0x10b)
    // standard fields: leave zeros except what BFD demands
    if (is64) w32(o + 24, 0x140000000L & 0xffffffffL) // image base lo
    else w32(o + 28, 0x400000L)
    w32(o + 32, 0x1000L) // section alignment
    w32(o + 36, fileAlign.toLong) // file alignment
    w16(o + 48, 6) // major subsystem version
    w32(o + 56, (0x1000L * (nS + 1))) // size of image
    w32(o + 60, headersSize.toLong) // size of headers
    w16(o + 68, 3) // subsystem: console
    // data directory count
    w32(o + (if (is64) 108 else 92), 16L)
    for ((nm, i) <- sections.zipWithIndex) {
      val so = secOff + 40 * i
      val nb = nm.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(nb, 0, b, so, math.min(8, nb.length))
      w32(so + 8, 16L) // virtual size
      w32(so + 12, 0x1000L * (i + 1)) // virtual address
      w32(so + 16, fileAlign.toLong) // raw size
      w32(so + 20, (headersSize + fileAlign * i).toLong) // raw ptr
      w32(so + 36, 0x60000020L) // code | execute | read
    }
    b
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val peSchema: StructType = StructType(Seq(
    StructField("machine", StringType),
    StructField("is64", BooleanType),
    StructField("is_dll", BooleanType),
    StructField("subsystem", IntegerType),
    StructField("n_sections", IntegerType),
    StructField("section_names", StringType)))

  def decodePe(bytes: Array[Byte]): Seq[Any] =
    peMeta(bytes) match {
      case Some(m) => Seq[Any](m.machine, m.is64, m.isDll,
        m.subsystem, m.nSections, m.sectionNames.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-row synth: planted arch/dll/sections cycling. */
  def synthPes(df: DataFrame, idCol: String, nCol: String,
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
        val bytes = peWrite(is64 = id % 2 == 0,
          isDll = id % 3 == 0,
          (0 until n).map(j => s".s$j"))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
