package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ISO 9660 image walk (ECMA-119, the optical/installer image
  * format) with Rock Ridge names (SUSP `NM` entries, IEEE P1282)
  * and a Joliet fallback (the UCS-2 supplementary descriptor,
  * what Windows-era images carry instead of Rock Ridge).
  *
  * Walk: volume descriptors from sector 16 (type 1 primary, type 2
  * supplementary with the Joliet escape sequences, 255 terminator),
  * then a worklist traversal of directory extents — records never
  * cross sector boundaries (a zero length-byte skips to the next
  * sector), NUL/SOH self/parent entries are structural,
  * and each file id drops its `;1` version suffix unless a Rock
  * Ridge NM supplies the real name. The primary tree wins when it
  * carries Rock Ridge; otherwise the Joliet tree's UCS-2BE names
  * are used when present.
  *
  * Pinning: IsoSpec reads a bsdtar-written image (Rock Ridge +
  * Joliet, subdirectory, 8.3-mangled long name) byte-exactly, and
  * bsdtar lists/extracts the in-repo writer's images byte-exactly
  * (IsoPinGen records the recipe).
  *
  * Totality: None on damage; visited-extent cycle guard; bomb
  * guards. Scale: per-value, map-only.
  */
object Iso {

  private val Sector = 2048
  private val MaxEntries = 100000
  private val MaxFile = 64 << 20

  final case class IsoEntry(path: String, size: Long, isDir: Boolean,
      data: Array[Byte])

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Rock Ridge NM name from a record's system-use area, if any. */
  private def rrName(b: Array[Byte], from: Int, until: Int)
      : Option[String] = {
    var p = from
    val sb = new StringBuilder()
    var found = false
    while (p + 4 <= until) {
      val len = b(p + 2) & 0xff
      if (len < 4 || p + len > until) return if (found) Some(sb
        .toString) else None
      if (b(p) == 'N' && b(p + 1) == 'M' && len >= 5) {
        found = true
        sb.append(new String(b, p + 5, len - 5,
          java.nio.charset.StandardCharsets.UTF_8))
        if ((b(p + 4) & 0x01) == 0) return Some(sb.toString)
      }
      p += len
    }
    if (found) Some(sb.toString) else None
  }

  private final case class Rec(extent: Long, size: Long,
      isDir: Boolean, name: String, hadRR: Boolean)

  /** Parse one directory record at `o`; None for len 0. */
  private def record(b: Array[Byte], o: Int, joliet: Boolean)
      : Option[(Int, Option[Rec])] = {
    val len = b(o) & 0xff
    if (len == 0) return None
    if (o + len > b.length || len < 34) return Some((len, None))
    val extent = le32(b, o + 2)
    val size = le32(b, o + 10)
    val flags = b(o + 25) & 0xff
    val lfi = b(o + 32) & 0xff
    if (33 + lfi > len) return Some((len, None))
    if (lfi == 1 && (b(o + 33) == 0 || b(o + 33) == 1))
      return Some((len, None)) // self/parent
    val rawName =
      if (joliet) {
        if ((lfi & 1) == 1) return Some((len, None))
        new String(b, o + 33, lfi,
          java.nio.charset.StandardCharsets.UTF_16BE)
      } else new String(b, o + 33, lfi,
        java.nio.charset.StandardCharsets.US_ASCII)
    val suStart = o + 33 + lfi + (if ((lfi & 1) == 0) 1 else 0)
    val rr = if (joliet) None
      else rrName(b, suStart, o + len)
    val name = rr.getOrElse {
      val semi = rawName.indexOf(';')
      val base = if (semi >= 0) rawName.substring(0, semi)
        else rawName
      if (base.endsWith(".")) base.dropRight(1) else base
    }
    if (name.isEmpty || name.contains("/"))
      return Some((len, None))
    Some((len, Some(Rec(extent, size, (flags & 0x02) != 0, name,
      rr.isDefined))))
  }

  /** Walk one directory tree from a root record. None on damage. */
  private def walkTree(b: Array[Byte], rootExtent: Long,
      rootSize: Long, joliet: Boolean)
      : Option[(Seq[IsoEntry], Boolean)] = {
    val out = Seq.newBuilder[IsoEntry]
    var anyRR = false
    val seen = scala.collection.mutable.Set[Long]()
    val work = scala.collection.mutable.ArrayDeque[
      (Long, Long, String)]((rootExtent, rootSize, ""))
    var n = 0
    while (work.nonEmpty) {
      val (extent, size, path) = work.removeHead()
      if (!seen.add(extent)) return None // cycle
      if (extent < 0 || size < 0 || size > MaxFile) return None
      val start = extent * Sector
      if (start + size > b.length || start > Int.MaxValue.toLong)
        return None
      var o = start.toInt
      val end = (start + size).toInt
      while (o < end) {
        record(b, o, joliet) match {
          case None => // zero byte: records stop at sector edge
            o = ((o / Sector) + 1) * Sector
          case Some((len, rec)) =>
            rec.foreach { r =>
              n += 1
              if (n > MaxEntries) return None
              anyRR ||= r.hadRR
              val p = if (path.isEmpty) r.name
                else path + "/" + r.name
              if (r.isDir) work.append((r.extent, r.size, p))
              else {
                val ds = r.extent * Sector
                if (r.size > MaxFile || ds < 0 ||
                  ds + r.size > b.length) return None
                out += IsoEntry(p, r.size, isDir = false,
                  java.util.Arrays.copyOfRange(b, ds.toInt,
                    (ds + r.size).toInt))
              }
            }
            o += len
        }
      }
      // directories surface as rows too (after their location is
      // known; data-less)
      if (path.nonEmpty)
        out += IsoEntry(path, 0L, isDir = true, Array.emptyByteArray)
    }
    Some((out.result(), anyRR))
  }

  /** List an ISO image. Primary tree with Rock Ridge names when
    * present; Joliet tree otherwise (if one exists).
    */
  def isoEntries(b: Array[Byte]): Option[Seq[IsoEntry]] =
    try isoEntries0(b)
    catch { // totality: structural damage refuses, never crashes
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def isoEntries0(b: Array[Byte]): Option[Seq[IsoEntry]] = {
    if (b == null || b.length < 18 * Sector) return None
    var pvdRoot = -1
    var svdRoot = -1
    var s = 16
    var done = false
    while (!done && s < 64 && (s + 1) * Sector <= b.length) {
      val o = s * Sector
      val typ = b(o) & 0xff
      if (new String(b, o + 1, 5,
        java.nio.charset.StandardCharsets.US_ASCII) != "CD001")
        return None
      typ match {
        case 1 => if (pvdRoot < 0) pvdRoot = o + 156
        case 2 =>
          // Joliet demands the UCS-2 escape sequences at offset 88
          val esc = b(o + 88) == 0x25 && b(o + 89) == 0x2f &&
            (b(o + 90) == 0x40 || b(o + 90) == 0x43 ||
              b(o + 90) == 0x45)
          if (esc && svdRoot < 0) svdRoot = o + 156
        case 255 => done = true
        case _ => ()
      }
      s += 1
    }
    if (pvdRoot < 0) return None
    val rootExtent = le32(b, pvdRoot + 2)
    val rootSize = le32(b, pvdRoot + 10)
    walkTree(b, rootExtent, rootSize, joliet = false) match {
      case Some((es, true)) => Some(es)
      case primary =>
        if (svdRoot >= 0) {
          val je = le32(b, svdRoot + 2)
          val js = le32(b, svdRoot + 10)
          walkTree(b, je, js, joliet = true).map(_._1)
            .orElse(primary.map(_._1))
        } else primary.map(_._1)
    }
  }

  // ---------------------------------------------------------------
  // writer: primary volume + Rock Ridge NM names + L/M path tables
  // ---------------------------------------------------------------

  /** Write a one-directory-level ISO (paths may contain one `/`).
    * ISO level-1 ids with `;1` versions plus Rock Ridge NM carrying
    * the real name — the layout bsdtar itself emits.
    */
  def isoWrite(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(files.forall(_._1.count(_ == '/') <= 1))
    val dirs = files.map(_._1).filter(_.contains("/"))
      .map(p => p.substring(0, p.indexOf('/'))).distinct.sorted
    // sector plan: 0-15 system, 16 PVD, 17 terminator, 18 L path
    // table, 19 M path table, 20 root dir, 21.. subdirs, then data
    val rootLba = 20
    val dirLba = dirs.zipWithIndex.map { case (d, i) =>
      d -> (21 + i) }.toMap
    var nextData = 21 + dirs.length
    val fileLba = scala.collection.mutable.Map[String, Int]()
    for ((p, d) <- files) {
      fileLba(p) = if (d.isEmpty) 0 else nextData
      nextData += math.max(1, (d.length + Sector - 1) / Sector)
    }
    val total = nextData
    val img = new Array[Byte](total * Sector)
    def put(o: Int, s: String): Unit = {
      val x = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(x, 0, img, o, x.length)
    }
    def w32le(o: Int, v: Long): Unit = {
      img(o) = (v & 0xff).toByte
      img(o + 1) = ((v >> 8) & 0xff).toByte
      img(o + 2) = ((v >> 16) & 0xff).toByte
      img(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w32be(o: Int, v: Long): Unit = {
      img(o) = ((v >> 24) & 0xff).toByte
      img(o + 1) = ((v >> 16) & 0xff).toByte
      img(o + 2) = ((v >> 8) & 0xff).toByte
      img(o + 3) = (v & 0xff).toByte
    }
    def both32(o: Int, v: Long): Unit = { w32le(o, v); w32be(o + 4, v) }
    def both16(o: Int, v: Int): Unit = {
      img(o) = (v & 0xff).toByte
      img(o + 1) = ((v >> 8) & 0xff).toByte
      img(o + 2) = ((v >> 8) & 0xff).toByte
      img(o + 3) = (v & 0xff).toByte
    }
    /** ISO level-1 8.3 id. */
    def isoId(name: String): String = {
      val up = name.toUpperCase.map(c =>
        if ((c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')) c
        else '_')
      val dot = name.lastIndexOf('.')
      val (base, ext) =
        if (dot > 0) (up.substring(0, math.min(dot, 8)).take(8),
          up.substring(dot + 1).take(3))
        else (up.take(8), "")
      if (ext.isEmpty) base else s"$base.$ext"
    }
    /** One directory record with an NM system-use entry. The
      * structural self/parent entries pass idRaw 0x00/0x01.
      */
    def recRaw(at: Int, idB: Array[Byte], nm: String, extent: Int,
        size: Int, isDir: Boolean, sp: Boolean = false): Int = {
      val nmB = nm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val pad = if ((idB.length & 1) == 0) 1 else 0
      // SUSP SP indicator (root self record only) turns Rock Ridge
      // processing on in libarchive and friends
      // the root self record carries the SUSP SP indicator plus an
      // inline RRIP ER extension record — readers (libarchive) key
      // their Rock Ridge detection on the ER announcement
      val ErId = "RRIP_1991A"
      val spLen = if (sp) 7 + 8 + ErId.length else 0
      val su = spLen + (if (nm.isEmpty) 0 else 5 + 5 + nmB.length)
      var len = 33 + idB.length + pad + su
      if ((len & 1) == 1) len += 1
      img(at) = len.toByte
      both32(at + 2, extent.toLong)
      both32(at + 10, size.toLong)
      img(at + 25) = if (isDir) 0x02 else 0x00
      both16(at + 28, 1) // volume sequence number
      img(at + 32) = idB.length.toByte
      System.arraycopy(idB, 0, img, at + 33, idB.length)
      var so = at + 33 + idB.length + pad
      if (sp) {
        img(so) = 'S'; img(so + 1) = 'P'; img(so + 2) = 7
        img(so + 3) = 1 // version
        img(so + 4) = 0xbe.toByte; img(so + 5) = 0xef.toByte
        img(so + 6) = 0 // bytes skipped
        so += 7
        val idB2 = ErId.getBytes(
          java.nio.charset.StandardCharsets.US_ASCII)
        img(so) = 'E'; img(so + 1) = 'R'
        img(so + 2) = (8 + idB2.length).toByte
        img(so + 3) = 1 // version
        img(so + 4) = idB2.length.toByte
        img(so + 5) = 0 // len_des
        img(so + 6) = 0 // len_src
        img(so + 7) = 1 // extension version
        System.arraycopy(idB2, 0, img, so + 8, idB2.length)
        so += 8 + idB2.length
      }
      if (nm.nonEmpty) {
        img(so) = 'R'; img(so + 1) = 'R'; img(so + 2) = 5
        img(so + 3) = 1 // version
        img(so + 4) = 0x08 // NM present
        so += 5
        img(so) = 'N'; img(so + 1) = 'M'
        img(so + 2) = (5 + nmB.length).toByte
        img(so + 3) = 1 // version
        img(so + 4) = 0 // flags
        System.arraycopy(nmB, 0, img, so + 5, nmB.length)
      }
      at + len
    }
    def rec(at: Int, id: String, nm: String, extent: Int,
        size: Int, isDir: Boolean): Int =
      recRaw(at, id.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII), nm, extent,
        size, isDir)
    // root + subdir extents
    def dirExtent(lba: Int, selfLba: Int, parentLba: Int,
        children: Seq[(String, String, Int, Int, Boolean)]): Unit = {
      var at = lba * Sector
      at = recRaw(at, Array[Byte](0), "", selfLba, Sector,
        isDir = true, sp = lba == rootLba)
      at = recRaw(at, Array[Byte](1), "", parentLba, Sector,
        isDir = true)
      for ((id, nm, ext, sz, d) <- children.sortBy(_._1))
        at = rec(at, id, nm, ext, sz, d)
      require(at <= (lba + 1) * Sector, "directory overflow")
    }
    val rootKids =
      dirs.map(d => (isoId(d), d, dirLba(d), Sector, true)) ++
        files.filter(!_._1.contains("/")).map { case (p, d) =>
          (isoId(p), p, fileLba(p), d.length, false) }
    dirExtent(rootLba, rootLba, rootLba, rootKids)
    for (d <- dirs) {
      val kids = files.filter(_._1.startsWith(d + "/")).map {
        case (p, dat) =>
          val leaf = p.substring(p.indexOf('/') + 1)
          (isoId(leaf), leaf, fileLba(p), dat.length, false)
      }
      dirExtent(dirLba(d), dirLba(d), rootLba, kids)
    }
    // file data
    for ((p, d) <- files if d.nonEmpty)
      System.arraycopy(d, 0, img, fileLba(p) * Sector, d.length)
    // path tables (L at 18, M at 19): root + subdirs
    def pathTable(lba: Int, be: Boolean): Int = {
      var at = lba * Sector
      def pt(id: String, extent: Int, parent: Int): Unit = {
        val idB = id.getBytes(
          java.nio.charset.StandardCharsets.US_ASCII)
        img(at) = idB.length.toByte
        if (be) w32be(at + 2, extent.toLong)
        else w32le(at + 2, extent.toLong)
        if (be) { img(at + 6) = ((parent >> 8) & 0xff).toByte
          img(at + 7) = (parent & 0xff).toByte }
        else { img(at + 6) = (parent & 0xff).toByte
          img(at + 7) = ((parent >> 8) & 0xff).toByte }
        System.arraycopy(idB, 0, img, at + 8, idB.length)
        at += 8 + idB.length + (idB.length & 1)
      }
      pt("\u0000", rootLba, 1)
      dirs.foreach(d => pt(isoId(d), dirLba(d), 1))
      at - lba * Sector
    }
    val ptSize = pathTable(18, be = false)
    pathTable(19, be = true)
    // PVD
    val pvd = 16 * Sector
    img(pvd) = 1
    put(pvd + 1, "CD001")
    img(pvd + 6) = 1
    put(pvd + 8, "GRAFT".padTo(32, ' ')) // system id
    put(pvd + 40, "GRAFTISO".padTo(32, ' ')) // volume id
    both32(pvd + 80, total.toLong) // volume space size
    both16(pvd + 120, 1) // set size
    both16(pvd + 124, 1) // sequence number
    both16(pvd + 128, Sector) // block size
    both32(pvd + 132, ptSize.toLong) // path table size
    w32le(pvd + 140, 18L) // L path table
    w32be(pvd + 148, 19L) // M path table
    // root record (34 bytes at 156)
    img(pvd + 156) = 34
    both32(pvd + 158, rootLba.toLong)
    both32(pvd + 166, Sector.toLong)
    img(pvd + 181) = 0x02
    both16(pvd + 184, 1)
    img(pvd + 188) = 1 // len_fi
    img(pvd + 189) = 0 // id: root
    img(pvd + 881) = 1 // file structure version
    // terminator
    img(17 * Sector) = 255.toByte
    put(17 * Sector + 1, "CD001")
    img(17 * Sector + 6) = 1
    img
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  /** Per-row synth: `n` files, odd ones inside a subdirectory. */
  def synthIsos(df: DataFrame, idCol: String, textCol: String,
      nCol: String, outCol: String): DataFrame = {
    val (ti, ni) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val n = r.getInt(ni)
        val bytes = isoWrite((0 until n).map { j =>
          val p = if (j % 2 == 1) s"sub/f$j.txt" else s"f$j.txt"
          (p, (s"i$j:" + text).getBytes("UTF-8"))
        })
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** One row per file with extraction verified (dirs excluded). */
  def isoEntryRows(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("entry_path", StringType),
      StructField("u_size", LongType),
      StructField("ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        isoEntries(r.getAs[Array[Byte]](ci)).toSeq.flatten
          .filter(!_.isDir).map(e =>
            Row(id, e.path, e.size,
              e.data.length.toLong == e.size))
      }
    }(enc)
  }
}
