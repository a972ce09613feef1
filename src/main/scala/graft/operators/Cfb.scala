package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Compound File Binary (MS-CFB) container walk — the carrier of
  * legacy Office (.doc/.xls/.ppt), MSI, and Outlook .msg files a
  * long-tail crawl still holds. From the public [MS-CFB] format:
  * 512-byte header (v3) with the 109-entry DIFAT + DIFAT sector
  * chain, FAT chains, the directory as 128-byte UTF-16LE entries,
  * and BOTH stream paths — ≥4096-byte streams through FAT sectors,
  * smaller ones through the root entry's mini stream via the
  * miniFAT (64-byte mini sectors). Loop guards on every chain.
  * Classification by stream names (WordDocument / Workbook /
  * PowerPoint Document / encryption markers). Truncation, bad
  * magic, cyclic chains → None.
  *
  * On top of the walk, [[docText]] reconstructs Word 97+ TEXT via
  * the real piece-table machinery ([MS-DOC]): FIB → fcClx in the
  * 0Table/1Table stream → Clx → Pcdt → PlcPcd pieces, each either
  * cp1252-compressed (fc/2) or UTF-16LE. Encrypted FIBs refuse.
  */
object Cfb {

  /** One directory stream: name, size, bytes. `path` is the
    * "/"-joined STORAGE path above the leaf ("" for root-level
    * streams) — round 15, for the .msg attachment walk.
    */
  final case class CfbStream(name: String, size: Long,
      data: Array[Byte], path: String = "")

  /** Parsed container: streams + a coarse content label. */
  final case class CfbDoc(streams: Seq[CfbStream], label: String)

  private object CfbFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val EndOfChain = 0xfffffffeL
  private val FreeSect = 0xffffffffL
  private val MaxStream = 64 << 20

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Walk a CFB container to its streams. None for non-CFB bytes or
    * structural damage.
    */
  def cfbStreams(b: Array[Byte]): Option[CfbDoc] = {
    if (b == null || b.length < 512) return None
    if (!((b(0) & 0xff) == 0xd0 && (b(1) & 0xff) == 0xcf &&
      (b(2) & 0xff) == 0x11 && (b(3) & 0xff) == 0xe0 &&
      (b(4) & 0xff) == 0xa1 && (b(5) & 0xff) == 0xb1 &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0xe1)) return None
    try {
      val major = le16(b, 26)
      val sectorShift = le16(b, 30)
      if (!((major == 3 && sectorShift == 9) ||
        (major == 4 && sectorShift == 12))) throw CfbFail
      val ss = 1 << sectorShift // sector size
      val miniShift = le16(b, 32)
      if (miniShift != 6) throw CfbFail
      val nFat = le32(b, 44)
      val firstDir = le32(b, 48)
      val miniCutoff = le32(b, 56)
      val firstMiniFat = le32(b, 60)
      val nMiniFat = le32(b, 64)
      val firstDifat = le32(b, 68)
      val nDifat = le32(b, 72)
      def sectorOff(sect: Long): Int = {
        val o = (sect + 1) * ss
        if (o < 0 || o + ss > b.length) throw CfbFail
        o.toInt
      }
      // DIFAT: 109 header entries + chained DIFAT sectors
      val fatSects = scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      while (i < 109) {
        val v = le32(b, 76 + i * 4)
        if (v != FreeSect && v != EndOfChain) fatSects += v
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect) {
        guard += 1
        if (guard > nDifat + 16 || guard > 4096) throw CfbFail
        val off = sectorOff(difat)
        var k = 0
        while (k < ss / 4 - 1) {
          val v = le32(b, off + k * 4)
          if (v != FreeSect && v != EndOfChain) fatSects += v
          k += 1
        }
        difat = le32(b, off + ss - 4)
      }
      if (fatSects.length < nFat) throw CfbFail
      // FAT lookup
      val entriesPerSect = ss / 4
      def fatAt(sect: Long): Long = {
        val idx = sect / entriesPerSect
        if (idx >= fatSects.length) throw CfbFail
        val off = sectorOff(fatSects(idx.toInt))
        le32(b, off + ((sect % entriesPerSect) * 4).toInt)
      }
      /** Read a FAT chain. */
      def readChain(start: Long, sizeHint: Long): Array[Byte] = {
        if (sizeHint > MaxStream) throw CfbFail
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var hops = 0
        while (s != EndOfChain) {
          hops += 1
          if (hops > b.length / ss + 4) throw CfbFail // cycle bomb
          if (s == FreeSect || s < 0) throw CfbFail
          out.write(b, sectorOff(s), ss)
          if (out.size > MaxStream) throw CfbFail
          s = fatAt(s)
        }
        out.toByteArray
      }
      // directory
      val dirBytes = readChain(firstDir, 0)
      val nEntries = dirBytes.length / 128
      if (nEntries == 0) throw CfbFail
      final case class DirEnt(name: String, objType: Int,
        startSect: Long, size: Long, left: Long, right: Long,
        child: Long)
      val ents = (0 until nEntries).map { e =>
        val o = e * 128
        val nameLen = le16(dirBytes, o + 64)
        val name =
          if (nameLen >= 2 && nameLen <= 64)
            new String(dirBytes, o, nameLen - 2,
              StandardCharsets.UTF_16LE)
          else ""
        val objType = dirBytes(o + 66) & 0xff
        val start = le32(dirBytes, o + 116)
        val size =
          if (major == 3) le32(dirBytes, o + 120)
          else le64(dirBytes, o + 120)
        DirEnt(name, objType, start, size,
          le32(dirBytes, o + 68), le32(dirBytes, o + 72),
          le32(dirBytes, o + 76))
      }
      val root = ents.find(_.objType == 5).getOrElse(throw CfbFail)
      // storage paths: walk the red-black sibling trees from each
      // storage's child pointer; bounded visits keep cyclic
      // directories from hanging a task
      val paths = new Array[String](nEntries)
      var visits = 0
      // iterative traversal (a linear sibling chain in a hostile or
      // merely large directory would blow the JVM stack if recursed);
      // frames marked assign=true fire after both siblings, keeping
      // the recursive order: left, right, self, then child descent
      val work = new scala.collection.mutable.ArrayDeque[
        (Long, String, Boolean)]()
      work.prepend((root.child, "", false))
      while (work.nonEmpty) {
        val (idx, path, assign) = work.removeHead()
        if (assign) {
          paths(idx.toInt) = path
          val e = ents(idx.toInt)
          if (e.objType == 1) // storage: descend with extended path
            work.prepend((e.child,
              if (path.isEmpty) e.name else path + "/" + e.name,
              false))
        } else if (idx != FreeSect && idx >= 0 && idx < nEntries) {
          visits += 1
          if (visits > nEntries * 2 + 8) throw CfbFail
          val e = ents(idx.toInt)
          work.prepend((idx, path, true))
          work.prepend((e.right, path, false))
          work.prepend((e.left, path, false))
        }
      }
      // mini FAT + mini stream
      lazy val miniFat: Array[Byte] =
        if (nMiniFat == 0) Array.emptyByteArray
        else readChain(firstMiniFat, nMiniFat * ss)
      lazy val miniStream: Array[Byte] =
        readChain(root.startSect, root.size)
      def miniFatAt(sect: Long): Long = {
        val o = sect * 4
        if (o + 4 > miniFat.length) throw CfbFail
        le32(miniFat, o.toInt)
      }
      def readMiniChain(start: Long, size: Long): Array[Byte] = {
        if (size > MaxStream) throw CfbFail
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var hops = 0
        while (s != EndOfChain) {
          hops += 1
          if (hops > miniStream.length / 64 + 4) throw CfbFail
          val off = s * 64
          if (off < 0 || off + 64 > miniStream.length) throw CfbFail
          out.write(miniStream, off.toInt, 64)
          s = miniFatAt(s)
        }
        out.toByteArray
      }
      val streams = ents.zipWithIndex
        .filter(_._1.objType == 2).map { case (e, ei) =>
          val raw =
            if (e.size >= miniCutoff) readChain(e.startSect, e.size)
            else if (e.size == 0) Array.emptyByteArray
            else readMiniChain(e.startSect, e.size)
          if (e.size > raw.length) throw CfbFail
          CfbStream(e.name, e.size,
            java.util.Arrays.copyOf(raw, e.size.toInt),
            Option(paths(ei)).getOrElse(""))
        }
      val names = streams.map(_.name).toSet
      val label =
        if (names.contains("WordDocument")) "application/msword"
        else if (names.contains("Workbook") ||
          names.contains("Book")) "application/vnd.ms-excel"
        else if (names.contains("PowerPoint Document"))
          "application/vnd.ms-powerpoint"
        else if (names.exists(_.startsWith("__substg1.0_")) ||
          names.contains("__properties_version1.0"))
          "application/vnd.ms-outlook"
        else if (names.exists(_.toLowerCase(java.util.Locale.ROOT)
          .contains("encrypt"))) "application/x-cfb-encrypted"
        else "application/x-cfb"
      Some(CfbDoc(streams, label))
    } catch {
      case CfbFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: OutOfMemoryError => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer (v3, 512-byte sectors)
  // ------------------------------------------------------------------

  /** Minimal real CFB: the given streams, routed through the mini
    * stream (<4096) or FAT chains (≥4096) exactly as Office writes
    * them; single-level directory under root.
    */
  def cfbWrite(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val ss = 512
    val pad = new Array[Byte](ss)
    // partition: big streams (FAT), small (mini stream)
    val big = streams.filter(_._2.length >= 4096)
    val small = streams.filter(_._2.length < 4096)
    // mini stream assembly: 64-byte mini sectors
    val miniData = new java.io.ByteArrayOutputStream()
    val miniStarts = scala.collection.mutable.Map[String, Int]()
    val miniChains = scala.collection.mutable.ArrayBuffer[Long]()
    for ((name, data) <- small) {
      val startMini = miniData.size() / 64
      miniStarts(name) = if (data.isEmpty) -2 else startMini
      val nMini = (data.length + 63) / 64
      miniData.write(data, 0, data.length)
      val padN = nMini * 64 - data.length
      if (padN > 0) miniData.write(pad, 0, padN)
      for (k <- 0 until nMini)
        miniChains += (if (k == nMini - 1) EndOfChain
        else (startMini + k + 1).toLong)
    }
    val miniBytes = miniData.toByteArray
    // sector plan: [FAT][miniFAT][dir...][miniStream...][big...]
    val nMiniFatSects =
      if (miniChains.isEmpty) 0
      else (miniChains.length * 4 + ss - 1) / ss
    val nStorages = streams.map(_._1).filter(_.contains("/"))
      .map(n => n.substring(0, n.indexOf('/'))).distinct.length
    val nDirEntries = 1 + streams.length + nStorages
    val nDirSects = math.max(1, (nDirEntries * 128 + ss - 1) / ss)
    val nMiniStreamSects = (miniBytes.length + ss - 1) / ss
    val bigSectCounts = big.map(e => (e._2.length + ss - 1) / ss)
    val fatSect = 0L
    val miniFatStart = 1L
    val dirStart = miniFatStart + nMiniFatSects
    val miniStreamStart = dirStart + nDirSects
    val bigStarts = bigSectCounts.scanLeft(
      miniStreamStart + nMiniStreamSects)(_ + _)
    val totalSects = bigStarts.lastOption
      .getOrElse(miniStreamStart + nMiniStreamSects)
    if (totalSects * 4 > ss) // one FAT sector cap for the fixture
      throw new IllegalArgumentException("fixture too large")
    // FAT sector
    val fat = new Array[Byte](ss)
    java.util.Arrays.fill(fat, 0xff.toByte) // FREESECT everywhere
    def fatPut(sect: Long, v: Long): Unit = {
      val o = (sect * 4).toInt
      fat(o) = (v & 0xff).toByte
      fat(o + 1) = ((v >> 8) & 0xff).toByte
      fat(o + 2) = ((v >> 16) & 0xff).toByte
      fat(o + 3) = ((v >> 24) & 0xff).toByte
    }
    fatPut(fatSect, 0xfffffffdL) // FATSECT marker
    for (k <- 0 until nMiniFatSects)
      fatPut(miniFatStart + k,
        if (k == nMiniFatSects - 1) EndOfChain else miniFatStart + k + 1)
    for (k <- 0 until nDirSects)
      fatPut(dirStart + k,
        if (k == nDirSects - 1) EndOfChain else dirStart + k + 1)
    for (k <- 0 until nMiniStreamSects)
      fatPut(miniStreamStart + k,
        if (k == nMiniStreamSects - 1) EndOfChain
        else miniStreamStart + k + 1)
    for ((start, cnt) <- bigStarts.zip(bigSectCounts); k <- 0 until cnt)
      fatPut(start + k,
        if (k == cnt - 1) EndOfChain else start + k + 1)
    // directory entries
    val dir = new Array[Byte]((nDirSects * ss))
    def w16d(o: Int, v: Int): Unit = {
      dir(o) = (v & 0xff).toByte; dir(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32d(o: Int, v: Long): Unit = {
      dir(o) = (v & 0xff).toByte
      dir(o + 1) = ((v >> 8) & 0xff).toByte
      dir(o + 2) = ((v >> 16) & 0xff).toByte
      dir(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def entry(idx: Int, name: String, objType: Int, left: Long,
        right: Long, child: Long, start: Long, size: Long): Unit = {
      val o = idx * 128
      val nb = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, dir, o, math.min(nb.length, 62))
      w16d(o + 64, nb.length + 2)
      dir(o + 66) = objType.toByte
      dir(o + 67) = 1 // black
      w32d(o + 68, left); w32d(o + 72, right); w32d(o + 76, child)
      w32d(o + 116, start)
      w32d(o + 120, size)
    }
    // root with child = first top-level entry. Names may carry ONE
    // "/" level: "storage/leaf" creates an objType-1 storage whose
    // child chains its members; top-level entries and member lists
    // are right-leaning (valid enough for tree walkers: every node
    // reachable, no cycles)
    val bigStartByName = {
      var bigIdx = -1
      streams.map { case (name, data) =>
        if (data.length >= 4096) { bigIdx += 1
          name -> bigStarts(bigIdx) }
        else name -> -1L
      }.toMap
    }
    def startSize(name: String, data: Array[Byte]): (Long, Long) =
      if (data.length >= 4096) (bigStartByName(name),
        data.length.toLong)
      else (miniStarts(name).toLong, data.length.toLong)
    // entry plan: walk streams in order, grouping consecutive
    // same-storage members under one storage entry
    final case class Top(storage: String,
      members: Seq[(String, Array[Byte])])
    val tops = scala.collection.mutable.ArrayBuffer[Top]()
    streams.foreach { case (name, data) =>
      val slash = name.indexOf('/')
      if (slash < 0) tops += Top("", Seq((name, data)))
      else {
        val st = name.substring(0, slash)
        if (tops.nonEmpty && tops.last.storage == st)
          tops(tops.length - 1) = tops.last.copy(
            members = tops.last.members :+ (name, data))
        else tops += Top(st, Seq((name, data)))
      }
    }
    // assign directory indices: top-level entries first need their
    // member indices known; lay out sequentially
    var nextIdx = 1
    val topIdx = tops.map { t =>
      val ti = nextIdx
      nextIdx += (if (t.storage.isEmpty) 1 else 1 + t.members.length)
      ti
    }
    entry(0, "Root Entry", 5, FreeSect, FreeSect,
      if (tops.isEmpty) FreeSect else topIdx.head.toLong,
      if (miniBytes.isEmpty) EndOfChain else miniStreamStart,
      miniBytes.length.toLong)
    tops.zipWithIndex.foreach { case (t, k) =>
      val ti = topIdx(k)
      val rightSib =
        if (k + 1 < tops.length) topIdx(k + 1).toLong else FreeSect
      if (t.storage.isEmpty) {
        val (name, data) = t.members.head
        val (start, size) = startSize(name, data)
        entry(ti, name, 2, FreeSect, rightSib, FreeSect,
          if (size == 0) EndOfChain else start, size)
      } else {
        entry(ti, t.storage, 1, FreeSect, rightSib,
          (ti + 1).toLong, EndOfChain, 0L)
        t.members.zipWithIndex.foreach { case ((full, data), mi) =>
          val leaf = full.substring(full.indexOf('/') + 1)
          val (start, size) = startSize(full, data)
          entry(ti + 1 + mi, leaf, 2, FreeSect,
            if (mi + 1 < t.members.length) (ti + 2 + mi).toLong
            else FreeSect,
            FreeSect, if (size == 0) EndOfChain else start, size)
        }
      }
    }
    // header
    val out = new java.io.ByteArrayOutputStream()
    val hdr = new Array[Byte](ss)
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    for (k <- magic.indices) hdr(k) = magic(k).toByte
    def h16(o: Int, v: Int): Unit = {
      hdr(o) = (v & 0xff).toByte; hdr(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def h32(o: Int, v: Long): Unit = {
      hdr(o) = (v & 0xff).toByte
      hdr(o + 1) = ((v >> 8) & 0xff).toByte
      hdr(o + 2) = ((v >> 16) & 0xff).toByte
      hdr(o + 3) = ((v >> 24) & 0xff).toByte
    }
    h16(24, 0x3e); h16(26, 3) // minor/major
    h16(28, 0xfffe) // little-endian marker
    h16(30, 9); h16(32, 6) // sector/mini shifts
    h32(44, 1) // one FAT sector
    h32(48, dirStart)
    h32(56, 4096) // mini cutoff
    h32(60, if (nMiniFatSects == 0) EndOfChain else miniFatStart)
    h32(64, nMiniFatSects.toLong)
    h32(68, EndOfChain); h32(72, 0) // no DIFAT chain
    h32(76, 0) // DIFAT[0] = FAT sector 0
    for (k <- 1 until 109) h32(76 + k * 4, FreeSect)
    out.write(hdr, 0, ss)
    out.write(fat, 0, ss)
    // miniFAT sectors
    if (nMiniFatSects > 0) {
      val mf = new Array[Byte](nMiniFatSects * ss)
      java.util.Arrays.fill(mf, 0xff.toByte)
      for ((v, k) <- miniChains.zipWithIndex) {
        val o = k * 4
        mf(o) = (v & 0xff).toByte
        mf(o + 1) = ((v >> 8) & 0xff).toByte
        mf(o + 2) = ((v >> 16) & 0xff).toByte
        mf(o + 3) = ((v >> 24) & 0xff).toByte
      }
      out.write(mf, 0, mf.length)
    }
    out.write(dir, 0, dir.length)
    if (miniBytes.nonEmpty) {
      out.write(miniBytes, 0, miniBytes.length)
      val padN = nMiniStreamSects * ss - miniBytes.length
      if (padN > 0) out.write(pad, 0, padN)
    }
    for ((_, data) <- big) {
      out.write(data, 0, data.length)
      val padN = ((data.length + ss - 1) / ss) * ss - data.length
      if (padN > 0) out.write(pad, 0, padN)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // .doc text via the Word 97+ piece table ([MS-DOC])
  // ------------------------------------------------------------------

  /** Decoded .doc: text + piece count. */
  final case class DocText(text: String, nPieces: Int)

  /** Word 97+ text reconstruction: FIB base (wIdent 0xA5EC) →
    * fWhichTblStm picks 0Table/1Table → fcClx/lcbClx (FibRgFcLcb97
    * pair 33) → Clx → Pcdt → PlcPcd: each piece maps a CP range to
    * an fc in WordDocument, 8-bit cp1252 when fCompressed (fc/2)
    * else UTF-16LE. Encrypted (fEncrypted) or structurally absent
    * piece tables → None — never mojibake from guessing.
    */
  def docText(b: Array[Byte]): Option[DocText] = {
    val doc = cfbStreams(b).getOrElse(return None)
    val word = doc.streams.find(_.name == "WordDocument")
      .map(_.data).getOrElse(return None)
    try {
      if (word.length < 512) throw CfbFail
      if (le16(word, 0) != 0xa5ec) throw CfbFail
      val flags = le16(word, 0x0a)
      if ((flags & 0x0100) != 0) throw CfbFail // fEncrypted
      val whichTbl = (flags >> 9) & 1
      val tblName = if (whichTbl == 1) "1Table" else "0Table"
      val tbl = doc.streams.find(_.name == tblName)
        .map(_.data).getOrElse(throw CfbFail)
      // FibRgFcLcb97 blob offset: FibBase(32) + 2 + csw*2 + 2 +
      // cslw*4 + 2
      val csw = le16(word, 32)
      val cslwOff = 32 + 2 + csw * 2
      val cslw = le16(word, cslwOff)
      val blobOff = cslwOff + 2 + cslw * 4 + 2
      val fcClx = le32(word, blobOff + 33 * 8)
      val lcbClx = le32(word, blobOff + 33 * 8 + 4)
      if (lcbClx <= 0 || fcClx < 0 ||
        fcClx + lcbClx > tbl.length) throw CfbFail
      // Clx: skip Prc entries (clxt=1) to the Pcdt (clxt=2)
      var p = fcClx.toInt
      val clxEnd = (fcClx + lcbClx).toInt
      while (p < clxEnd && (tbl(p) & 0xff) == 1) {
        val cb = le16(tbl, p + 1)
        p += 3 + cb
      }
      if (p >= clxEnd || (tbl(p) & 0xff) != 2) throw CfbFail
      val lcbPlc = le32(tbl, p + 1)
      val plc = p + 5
      if (lcbPlc < 4 || plc + lcbPlc > clxEnd + 0 ||
        plc + lcbPlc > tbl.length) throw CfbFail
      val n = ((lcbPlc - 4) / 12).toInt
      if (n <= 0 || n > (1 << 20)) throw CfbFail
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        val cpStart = le32(tbl, plc + i * 4)
        val cpEnd = le32(tbl, plc + (i + 1) * 4)
        val cpLen = cpEnd - cpStart
        if (cpLen < 0 || cpLen > MaxStream) throw CfbFail
        val pcdOff = plc + (n + 1) * 4 + i * 8
        val fcRaw = le32(tbl, pcdOff + 2)
        val compressed = (fcRaw & 0x40000000L) != 0
        val fc = fcRaw & 0x3fffffffL
        if (compressed) {
          val off = (fc / 2).toInt
          if (off + cpLen > word.length) throw CfbFail
          sb.append(new String(word, off, cpLen.toInt,
            java.nio.charset.Charset.forName("windows-1252")))
        } else {
          if (fc + cpLen * 2 > word.length) throw CfbFail
          sb.append(new String(word, fc.toInt, cpLen.toInt * 2,
            StandardCharsets.UTF_16LE))
        }
        if (sb.length > MaxStream) throw CfbFail
        i += 1
      }
      // Word stores paragraph marks as CR; normalize to LF
      Some(DocText(sb.toString.replace('\r', '\n'), n))
    } catch {
      case CfbFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Real .doc fixture: FIB + piece table in 1Table + text pieces in
    * WordDocument. The text is split into two pieces; each piece is
    * cp1252-compressed when its chars allow, UTF-16LE otherwise —
    * both decode paths exercised whenever the split allows.
    */
  def docWrite(text: String): Array[Byte] = {
    val cut = {
      // split near the middle without cutting a surrogate pair
      var c = text.length / 2
      if (c > 0 && c < text.length &&
        Character.isHighSurrogate(text.charAt(c - 1)) &&
        Character.isLowSurrogate(text.charAt(c))) c += 1
      c
    }
    val pieces0 = Seq(text.substring(0, cut), text.substring(cut))
      .filter(_.nonEmpty)
    val pieces = if (pieces0.isEmpty) Seq("") else pieces0
    val cs1252 = java.nio.charset.Charset.forName("windows-1252")
    // Word's CR paragraph marks: our \n goes in as \r
    def wire(s: String): String = s.replace('\n', '\r')
    def cp1252able(c: Char): Boolean = {
      if (Character.isSurrogate(c)) return false
      val bs = c.toString.getBytes(cs1252)
      bs.length == 1 && new String(bs, cs1252) == c.toString
    }
    val word = new java.io.ByteArrayOutputStream()
    word.write(new Array[Byte](1024), 0, 1024) // FIB area
    val pieceMeta = pieces.map { p0 =>
      val p = wire(p0)
      val canCompress = p.nonEmpty && p.forall(cp1252able)
      val off = word.size()
      if (canCompress) {
        val bytes = p.getBytes(cs1252)
        word.write(bytes, 0, bytes.length)
        (off, p.length, true)
      } else {
        val bytes = p.getBytes(StandardCharsets.UTF_16LE)
        word.write(bytes, 0, bytes.length)
        (off, p.length, false)
      }
    }
    val wordBytes = word.toByteArray
    // FIB base
    def p16(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(a: Array[Byte], o: Int, v: Long): Unit = {
      a(o) = (v & 0xff).toByte
      a(o + 1) = ((v >> 8) & 0xff).toByte
      a(o + 2) = ((v >> 16) & 0xff).toByte
      a(o + 3) = ((v >> 24) & 0xff).toByte
    }
    p16(wordBytes, 0, 0xa5ec)
    p16(wordBytes, 2, 0x00c1) // nFib: Word 97
    p16(wordBytes, 0x0a, 1 << 9) // fWhichTblStm = 1
    val csw = 14
    val cslw = 22
    p16(wordBytes, 32, csw)
    val cslwOff = 32 + 2 + csw * 2
    p16(wordBytes, cslwOff, cslw)
    val blobOff = cslwOff + 2 + cslw * 4 + 2
    p16(wordBytes, blobOff - 2, 93) // cbRgFcLcb
    // 1Table: Pcdt at offset 0
    val nP = pieces.length
    val lcbPlc = 4 + nP * 12
    val tbl = new Array[Byte](5 + lcbPlc)
    tbl(0) = 2
    p32(tbl, 1, lcbPlc.toLong)
    var cp = 0L
    for (i <- 0 to nP) {
      p32(tbl, 5 + i * 4, cp)
      if (i < nP) cp += pieceMeta(i)._2
    }
    for (i <- 0 until nP) {
      val (off, _, compressed) = pieceMeta(i)
      val pcdOff = 5 + (nP + 1) * 4 + i * 8
      val fc =
        if (compressed) (off.toLong * 2) | 0x40000000L
        else off.toLong
      p32(tbl, pcdOff + 2, fc)
    }
    p32(wordBytes, blobOff + 33 * 8, 0L) // fcClx
    p32(wordBytes, blobOff + 33 * 8 + 4, tbl.length.toLong) // lcbClx
    cfbWrite(Seq(
      ("WordDocument", wordBytes),
      ("1Table", tbl),
      ("SummaryInformation", "meta".getBytes("UTF-8"))))
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val cfbSchema: StructType = StructType(Seq(
    StructField("cfb_label", StringType),
    StructField("n_streams", IntegerType),
    StructField("stream_names", StringType),
    StructField("word_text", StringType)))

  /** Decode kernel: label + stream census + the WordDocument
    * stream's bytes as UTF-8 text up to the first NUL (the fixture
    * padding convention).
    */
  def decodeCfb(bytes: Array[Byte]): Seq[Any] =
    cfbStreams(bytes) match {
      case Some(CfbDoc(streams, label)) =>
        val names = streams.map(_.name).sorted.mkString(",")
        val word = streams.find(_.name == "WordDocument").map { s =>
          val data = s.data
          var e = 0
          while (e < data.length && data(e) != 0) e += 1
          new String(data, 0, e, StandardCharsets.UTF_8)
        }.orNull
        Seq[Any](label, streams.length, names, word)
      case None => Seq[Any](null, null, null, null)
    }

  val docTextSchema: StructType = StructType(Seq(
    StructField("doc_text", StringType),
    StructField("n_pieces", IntegerType)))

  def decodeDocText(bytes: Array[Byte]): Seq[Any] =
    docText(bytes) match {
      case Some(DocText(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  /** Per-row Word 97 .doc synthesizer (map-only). */
  def synthDoc(df: DataFrame, textCol: String, outCol: String)
      : DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        Row.fromSeq(r.toSeq :+ docWrite(text))
      }
    }(enc)
  }

  /** Per-row CFB synthesizer: a WordDocument stream carrying the doc
    * text (odd docs padded past the 4096 mini-cutoff → FAT path,
    * even docs small → miniFAT path) + a small companion stream.
    */
  def synthCfb(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val tb = text.getBytes(StandardCharsets.UTF_8)
        val word =
          if (id % 2 == 1) java.util.Arrays.copyOf(tb,
            math.max(tb.length + 1, 4400)) // NUL-padded, FAT path
          else tb
        val bytes = cfbWrite(Seq(
          ("WordDocument", word),
          ("SummaryInformation",
            ("summary " + id).getBytes(StandardCharsets.UTF_8))))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
