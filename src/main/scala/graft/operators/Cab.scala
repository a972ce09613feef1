package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Microsoft Cabinet (.cab) extraction (the public [MS-CAB] spec) —
  * the Windows-ecosystem archive class a crawl meets in driver
  * bundles, installers and office add-ins: CFHEADER (reserve areas,
  * prev/next chain fields parsed and single-cabinet enforced),
  * CFFOLDER compression types, CFFILE directory (folder offsets,
  * UTF-8 name flag), and CFDATA blocks with the spec's XOR-folded
  * checksum verified on every block.
  *
  * Compression: `none` and MSZIP (per-block 'CK' signature + raw
  * DEFLATE, with the sliding window CARRIED ACROSS blocks within a
  * folder — each block's inflater is preset with the folder's prior
  * output, the detail naive implementations miss). QUANTUM and LZX
  * refuse honestly.
  *
  * Reference pinning: libarchive's bsdtar READS cab — every archive
  * this writer emits is extracted byte-exactly by it at fixture
  * generation (CabSpec pins the committed fixtures), covering both
  * directions the same way 7z did.
  *
  * Totality: None for structural damage, checksum mismatches,
  * unsupported compression, or bomb-guard trips; never throws.
  */
object Cab {

  private final case class CabFail(why: String)
    extends RuntimeException(why)
  private def fail(why: String): Nothing = throw CabFail(why)

  private val MaxOut = 64 << 20
  private val MaxFiles = 65535

  final case class CabEntry(name: String, size: Long, folder: Int,
      compression: String)

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** The spec's XOR-folded checksum (CSUMCompute): LE u32 words,
    * then the 1-3 tail bytes folded with the spec's byte order.
    */
  private[operators] def csum(b: Array[Byte], from: Int, until: Int,
      seed: Long): Long = {
    var c = seed
    var p = from
    while (until - p >= 4) {
      c ^= le32(b, p)
      p += 4
    }
    var ul = 0L
    val rem = until - p
    if (rem == 3) { ul |= (b(p) & 0xffL) << 16; p += 1 }
    if (rem >= 2) { ul |= (b(p) & 0xffL) << 8; p += 1 }
    if (rem >= 1) ul |= b(p) & 0xffL
    (c ^ ul) & 0xffffffffL
  }

  private final case class Folder(dataOff: Long, nData: Int,
      compType: Int)
  private final case class FileRec(name: String, size: Long,
      folderOff: Long, iFolder: Int)

  private def compName(t: Int): String = (t & 0xf) match {
    case 0 => "none"
    case 1 => "mszip"
    case 2 => "quantum"
    case 3 => "lzx"
    case other => f"0x$other%x"
  }

  /** Parse header + directory. */
  private def parse(b: Array[Byte])
      : (Seq[Folder], Seq[FileRec], Int, Int) = {
    if (b == null || b.length < 44) fail("short")
    if (b(0) != 'M' || b(1) != 'S' || b(2) != 'C' || b(3) != 'F')
      fail("bad magic")
    val cbCabinet = le32(b, 8)
    if (cbCabinet > b.length) fail("truncated cabinet")
    val coffFiles = le32(b, 16)
    val verMinor = b(24) & 0xff
    val verMajor = b(25) & 0xff
    if (verMajor != 1 || verMinor != 3) fail("unsupported version")
    val cFolders = le16(b, 26)
    val cFiles = le16(b, 28)
    val flags = le16(b, 30)
    if ((flags & 0x3) != 0) fail("multi-cabinet set") // prev/next
    if (cFiles > MaxFiles || cFolders > MaxFiles) fail("bomb")
    var p = 36
    var cbCFFolder = 0
    var cbCFData = 0
    if ((flags & 0x4) != 0) { // reserve areas
      val cbCFHeader = le16(b, 36)
      cbCFFolder = b(38) & 0xff
      cbCFData = b(39) & 0xff
      p = 40 + cbCFHeader
    }
    val folders = (0 until cFolders).map { _ =>
      if (p + 8 > b.length) fail("folder oob")
      val f = Folder(le32(b, p), le16(b, p + 4), le16(b, p + 6))
      p += 8 + cbCFFolder
      f
    }
    p = coffFiles.toInt
    val files = (0 until cFiles).map { _ =>
      if (p + 16 > b.length) fail("file oob")
      val size = le32(b, p)
      val off = le32(b, p + 4)
      val iFolder = le16(b, p + 8)
      val attribs = le16(b, p + 14)
      var q = p + 16
      while (q < b.length && b(q) != 0) q += 1
      if (q >= b.length) fail("unterminated name")
      val name = new String(b, p + 16, q - (p + 16),
        if ((attribs & 0x80) != 0) "UTF-8" else "ISO-8859-1")
      p = q + 1
      if (size > MaxOut) fail("member bomb")
      FileRec(name, size, off, iFolder)
    }
    (folders, files, cbCFData, flags)
  }

  /** Decompress one folder's full uncompressed stream. */
  private def folderBytes(b: Array[Byte], f: Folder,
      cbCFData: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 << 10)
    var p = f.dataOff
    val comp = f.compType & 0xf
    if (comp != 0 && comp != 1) fail("unsupported compression")
    var window = Array.emptyByteArray // MSZIP cross-block history
    var i = 0
    while (i < f.nData) {
      if (p + 8 > b.length) fail("cfdata oob")
      val want = le32(b, p.toInt)
      val cbData = le16(b, p.toInt + 4)
      val cbUncomp = le16(b, p.toInt + 6)
      if (cbUncomp > 32768 + 12) fail("cfdata size") // spec cap
      val dataStart = p.toInt + 8 + cbCFData
      if (dataStart + cbData > b.length) fail("cfdata data oob")
      // checksum: data seeded with the two u16 fields
      val seed = csum(b, p.toInt + 4, p.toInt + 8, 0L)
      if (want != 0 && csum(b, dataStart, dataStart + cbData, seed)
          != want) fail("cfdata checksum")
      val plain = comp match {
        case 0 =>
          if (cbData != cbUncomp) fail("stored size mismatch")
          java.util.Arrays.copyOfRange(b, dataStart,
            dataStart + cbData)
        case 1 =>
          if (cbData < 2 || b(dataStart) != 'C' ||
            b(dataStart + 1) != 'K') fail("bad CK signature")
          val inf = new java.util.zip.Inflater(true)
          try {
            if (window.nonEmpty) inf.setDictionary(window)
            inf.setInput(b, dataStart + 2, cbData - 2)
            val buf = new Array[Byte](cbUncomp)
            var got = 0
            while (got < cbUncomp) {
              val n =
                try inf.inflate(buf, got, cbUncomp - got)
                catch {
                  case _: java.util.zip.DataFormatException =>
                    fail("mszip damage")
                }
              if (n == 0) {
                if (inf.needsDictionary()) fail("dictionary demand")
                if (inf.finished() || inf.needsInput())
                  fail("mszip short block")
              }
              got += n
            }
            buf
          } finally inf.end()
      }
      if (plain.length != cbUncomp) fail("block length lie")
      out.write(plain, 0, plain.length)
      if (out.size > MaxOut) fail("folder bomb")
      // carry the last 32K as the next block's preset window
      if (comp == 1) {
        val w = out.toByteArray
        window =
          if (w.length <= 32768) w
          else java.util.Arrays.copyOfRange(w, w.length - 32768,
            w.length)
      }
      p = dataStart + cbData
      i += 1
    }
    out.toByteArray
  }

  /** List entries (no decompression). None for non-CAB damage. */
  def entries(b: Array[Byte]): Option[Seq[CabEntry]] = {
    try {
      val (folders, files, _, _) = parse(b)
      Some(files.map { fr =>
        val comp =
          if (fr.iFolder < folders.length)
            compName(folders(fr.iFolder).compType)
          else "continued"
        CabEntry(fr.name, fr.size, fr.iFolder, comp)
      })
    } catch {
      case CabFail(_) => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Extract every member; per-member None on damaged folders. */
  def extractAll(b: Array[Byte])
      : Option[Seq[(CabEntry, Option[Array[Byte]])]] = {
    try {
      val (folders, files, cbCFData, _) = parse(b)
      val decoded = folders.map { f =>
        try Some(folderBytes(b, f, cbCFData))
        catch {
          case CabFail(_) => None
          case _: IndexOutOfBoundsException => None
          case _: NegativeArraySizeException => None
        }
      }
      Some(files.map { fr =>
        val comp =
          if (fr.iFolder < folders.length)
            compName(folders(fr.iFolder).compType)
          else "continued"
        val e = CabEntry(fr.name, fr.size, fr.iFolder, comp)
        val data =
          if (fr.iFolder >= folders.length) None
          else decoded(fr.iFolder).flatMap { fb =>
            if (fr.folderOff < 0 || fr.size < 0 ||
              fr.folderOff + fr.size > fb.length) None
            else Some(java.util.Arrays.copyOfRange(fb,
              fr.folderOff.toInt, (fr.folderOff + fr.size).toInt))
          }
        (e, data)
      })
    } catch {
      case CabFail(_) => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer (none + MSZIP folders; bsdtar-extracted at
  // generation, pinned in CabSpec)
  // ------------------------------------------------------------------

  /** Build a single-folder-per-compression cabinet: members
    * grouped by their `comp` flag (0 none, 1 MSZIP) into one folder
    * each, blocks split at 32768 with the cross-block window.
    */
  def write(members: Seq[(String, Array[Byte], Int)]): Array[Byte] = {
    val groups = members.zipWithIndex.groupBy(_._1._3).toSeq
      .sortBy(_._1)
    // folder plan: (comp, files with folder offsets, folder stream)
    val plan = groups.map { case (comp, ms) =>
      val stream = new java.io.ByteArrayOutputStream()
      val withOff = ms.map { case ((n, d, _), gi) =>
        val off = stream.size
        stream.write(d, 0, d.length)
        (n, d.length, off, gi)
      }
      (comp, withOff, stream.toByteArray)
    }
    // CFDATA payloads per folder
    val folderBlocks = plan.map { case (comp, _, stream) =>
      val blocks = Seq.newBuilder[(Array[Byte], Int)]
      var p = 0
      var window = Array.emptyByteArray
      if (stream.isEmpty) blocks += ((Array.emptyByteArray, 0))
      while (p < stream.length) {
        val n = math.min(32768, stream.length - p)
        val plain = java.util.Arrays.copyOfRange(stream, p, p + n)
        val payload = comp match {
          case 1 =>
            val d = new java.util.zip.Deflater(
              java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
            try {
              if (window.nonEmpty) d.setDictionary(window)
              d.setInput(plain); d.finish()
              val buf = new Array[Byte](plain.length * 2 + 64)
              var m = 0
              while (!d.finished()) m += d.deflate(buf, m,
                buf.length - m)
              Array[Byte]('C', 'K') ++
                java.util.Arrays.copyOf(buf, m)
            } finally d.end()
          case _ => plain
        }
        blocks += ((payload, n))
        window =
          if (p + n <= 32768) java.util.Arrays.copyOfRange(stream,
            0, p + n)
          else java.util.Arrays.copyOfRange(stream, p + n - 32768,
            p + n)
        p += n
      }
      blocks.result()
    }
    // directory sizes
    val nFolders = plan.length
    val headerSize = 36
    val folderDirSize = nFolders * 8
    val fileDir = new java.io.ByteArrayOutputStream()
    plan.zipWithIndex.foreach { case ((_, withOff, _), fi) =>
      withOff.foreach { case (name, len, off, _) =>
        val nb = name.getBytes("UTF-8")
        val ascii = name.forall(c => c < 0x80)
        val rec = new Array[Byte](16)
        def p32(o: Int, v: Long): Unit = (0 until 4).foreach(i =>
          rec(o + i) = ((v >> (8 * i)) & 0xff).toByte)
        def p16(o: Int, v: Int): Unit = {
          rec(o) = (v & 0xff).toByte
          rec(o + 1) = ((v >> 8) & 0xff).toByte
        }
        p32(0, len.toLong); p32(4, off.toLong); p16(8, fi)
        p16(10, 0x2a21) // date (fixed fixture stamp)
        p16(12, 0x5800) // time
        p16(14, if (ascii) 0x20 else 0xa0) // archive (+utf8)
        fileDir.write(rec, 0, 16)
        fileDir.write(nb, 0, nb.length)
        fileDir.write(0)
      }
    }
    val coffFiles = headerSize + folderDirSize
    var dataOff = coffFiles + fileDir.size
    val folderRecs = new java.io.ByteArrayOutputStream()
    val dataArea = new java.io.ByteArrayOutputStream()
    plan.zipWithIndex.foreach { case ((comp, _, _), fi) =>
      val blocks = folderBlocks(fi)
      val rec = new Array[Byte](8)
      (0 until 4).foreach(i => rec(i) =
        ((dataOff >> (8 * i)) & 0xff).toByte)
      rec(4) = (blocks.length & 0xff).toByte
      rec(5) = ((blocks.length >> 8) & 0xff).toByte
      rec(6) = (comp & 0xff).toByte
      rec(7) = 0
      folderRecs.write(rec, 0, 8)
      blocks.foreach { case (payload, un) =>
        val hdr = new Array[Byte](8)
        hdr(4) = (payload.length & 0xff).toByte
        hdr(5) = ((payload.length >> 8) & 0xff).toByte
        hdr(6) = (un & 0xff).toByte
        hdr(7) = ((un >> 8) & 0xff).toByte
        val seed = csum(hdr, 4, 8, 0L)
        val c = csum(payload, 0, payload.length, seed)
        (0 until 4).foreach(i => hdr(i) = ((c >> (8 * i)) & 0xff)
          .toByte)
        dataArea.write(hdr, 0, 8)
        dataArea.write(payload, 0, payload.length)
        dataOff += 8 + payload.length
      }
    }
    val total = coffFiles + fileDir.size + dataArea.size
    val out = new java.io.ByteArrayOutputStream(total)
    val h = new Array[Byte](36)
    h(0) = 'M'; h(1) = 'S'; h(2) = 'C'; h(3) = 'F'
    def h32(o: Int, v: Long): Unit = (0 until 4).foreach(i =>
      h(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def h16(o: Int, v: Int): Unit = {
      h(o) = (v & 0xff).toByte; h(o + 1) = ((v >> 8) & 0xff).toByte
    }
    h32(8, total.toLong)
    h32(16, coffFiles.toLong)
    h(24) = 3; h(25) = 1 // version 1.3
    h16(26, nFolders)
    h16(28, members.length)
    h16(30, 0) // flags
    h16(32, 0x5a7e) // setID
    h16(34, 0)
    out.write(h, 0, 36)
    folderRecs.writeTo(out)
    fileDir.writeTo(out)
    dataArea.writeTo(out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  /** Per-row .cab synthesizer: `nCol` members, member j named
    * `c<j>.dat` holding `k<j>:` + text, compression cycling
    * none/MSZIP by (id + j) % 2 (so both folder kinds appear).
    */
  def synthCabs(df: DataFrame, idCol: String, textCol: String,
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
        val bytes = write((0 until n).map { j =>
          (s"c$j.dat", (s"k$j:" + text).getBytes("UTF-8"),
            ((id + j) % 2).toInt)
        })
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** One row per member with real-extraction verification. */
  def cabEntryRows(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("entry_name", StringType),
      StructField("compression", StringType),
      StructField("u_size", LongType),
      StructField("ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        extractAll(r.getAs[Array[Byte]](ci)).toSeq.flatten.map {
          case (e, data) =>
            Row(id, e.name, e.compression, e.size,
              data.exists(_.length.toLong == e.size))
        }
      }
    }(enc)
  }
}
