package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** SQLite database file reading — table b-tree walk per the public
  * file-format spec (sqlite.org/fileformat2.html). SQLite files are
  * everywhere on a crawl (app exports, research datasets, browser
  * profiles) and are pure structured data a training pipeline wants
  * as rows, not as an opaque blob.
  *
  * The reference repo ingests only CSV
  * (`/root/reference/src/trousse/dataset.py:341`). Implemented from
  * the spec, no SQLite library:
  *
  *  - 100-byte header: magic, page size (u16 big-endian, 1 ≡ 65536),
  *    reserved-bytes-per-page honored in the usable-size U, text
  *    encoding — UTF-8 only, UTF-16 databases refuse honestly.
  *  - Table b-trees: interior (0x05) / leaf (0x0D) pages, the cell
  *    pointer array, varints (1–9 bytes, 9th byte all 8 bits),
  *    record headers with every serial type (NULL, i8..i64, f64,
  *    the constant-0/1 types 8/9, blob ≥12-even, text ≥13-odd).
  *  - The OVERFLOW split formulas for table leaves: X = U−35,
  *    M = ((U−12)·32/255)−23, K = M+((P−M) mod (U−4)) — payloads
  *    reassembled across overflow chains with cycle/bounds guards.
  *  - `sqlite_schema` (page 1, header offset 100) walked first for
  *    table name → rootpage; index/trigger/view entries skipped.
  *  - Page-count, depth, and payload bombs capped; any structural
  *    lie (cell past page end, overflow cycle, bad varint) refuses.
  *
  * Freelist pages, WAL sidecars, and index b-trees are intentionally
  * out of scope: table data is fully reachable without them (a WAL
  * database's MAIN file is still consistent at its last checkpoint).
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Sqlite {

  private object SqFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxPayload = 64 << 20
  private val MaxRows = 1 << 22

  /** One decoded cell value: null, Long, Double, String, or
    * Array[Byte].
    */
  type Value = Any

  final case class SqTable(name: String, rootPage: Int, sql: String)
  final case class SqDoc(tables: Seq[SqTable],
      rows: Map[String, Seq[(Long, IndexedSeq[Value])]])

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw SqFail
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw SqFail
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** Varint at `o`: (value, bytesRead). */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      if (o + i >= b.length) throw SqFail
      val c = b(o + i) & 0xff
      v = (v << 7) | (c & 0x7f)
      if ((c & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    if (o + 8 >= b.length) throw SqFail
    ((v << 8) | (b(o + 8) & 0xff), 9)
  }

  private final class Db(val b: Array[Byte]) {
    if (b.length < 100) throw SqFail
    val magic = "SQLite format 3\u0000"
    for (i <- 0 until 16)
      if ((b(i) & 0xff) != magic.charAt(i).toInt) throw SqFail
    val pageSize: Int = {
      val raw = u16(b, 16)
      if (raw == 1) 65536
      else if (raw < 512 || (raw & (raw - 1)) != 0) throw SqFail
      else raw
    }
    val reserved: Int = b(20) & 0xff
    val usable: Int = pageSize - reserved
    if (usable < 480) throw SqFail
    val nPages: Long = u32(b, 28)
    val encoding: Long = u32(b, 56)
    if (encoding != 1) throw SqFail // UTF-8 only, never mojibake
    val maxPage: Long =
      math.min(nPages, (b.length / pageSize).toLong)

    /** Absolute offset of page `p` (1-based). */
    def pageOff(p: Long): Int = {
      if (p < 1 || p > maxPage) throw SqFail
      ((p - 1) * pageSize).toInt
    }

    /** Reassemble a table-leaf cell payload: inline part + overflow
      * chain per the spec's X/M/K split.
      */
    def payload(cellOff: Int, pageEnd: Int, total: Long)
        : Array[Byte] = {
      if (total < 0 || total > MaxPayload) throw SqFail
      val u = usable
      val x = u - 35
      val inline =
        if (total <= x) total.toInt
        else {
          val m = ((u - 12) * 32 / 255) - 23
          val k = m + ((total - m) % (u - 4))
          (if (k <= x) k else m.toLong).toInt
        }
      if (cellOff + inline > pageEnd) throw SqFail
      val out = new Array[Byte](total.toInt)
      System.arraycopy(b, cellOff, out, 0, inline)
      var got = inline
      if (got < total) {
        var next = u32(b, cellOff + inline)
        val seen = new java.util.BitSet()
        while (got < total) {
          // a repeated page is a cycle: refuse, never repeated bytes
          if (next == 0 || next > maxPage ||
            seen.get(next.toInt)) throw SqFail
          seen.set(next.toInt)
          val off = pageOff(next)
          val take = math.min((total - got).toInt, u - 4)
          if (off + 4 + take > b.length) throw SqFail
          System.arraycopy(b, off + 4, out, got, take)
          got += take
          next = u32(b, off)
        }
      }
      out
    }

    /** Decode a record payload to (values). */
    def record(p: Array[Byte]): IndexedSeq[Value] = {
      val (hdrLen, n0) = varint(p, 0)
      if (hdrLen < n0 || hdrLen > p.length) throw SqFail
      val types = scala.collection.mutable.ArrayBuffer[Long]()
      var i = n0
      while (i < hdrLen) {
        val (t, n) = varint(p, i)
        types += t
        i += n
      }
      var d = hdrLen.toInt
      def be(len: Int): Long = {
        if (d + len > p.length) throw SqFail
        var v = if ((p(d) & 0x80) != 0) -1L else 0L
        var k = 0
        while (k < len) { v = (v << 8) | (p(d + k) & 0xff); k += 1 }
        d += len
        v
      }
      types.map {
        case 0 => null
        case 1 => be(1)
        case 2 => be(2)
        case 3 => be(3)
        case 4 => be(4)
        case 5 => be(6)
        case 6 => be(8)
        case 7 => java.lang.Double.longBitsToDouble(be(8))
        case 8 => 0L
        case 9 => 1L
        case t if t >= 12 && t % 2 == 0 =>
          val len = ((t - 12) / 2).toInt
          if (d + len > p.length) throw SqFail
          val out = java.util.Arrays.copyOfRange(p, d, d + len)
          d += len
          out
        case t if t >= 13 =>
          val len = ((t - 13) / 2).toInt
          if (d + len > p.length) throw SqFail
          val s = new String(p, d, len, StandardCharsets.UTF_8)
          d += len
          s
        case _ => throw SqFail // 10/11 reserved
      }.toIndexedSeq
    }

    /** Walk a table b-tree rooted at `page`, emitting (rowid,
      * record) in key order.
      */
    def walkTable(page: Long, depth: Int,
        out: (Long, IndexedSeq[Value]) => Unit): Unit =
      walkTable0(page, depth, new java.util.BitSet(), out)

    private def walkTable0(page: Long, depth: Int,
        seen: java.util.BitSet,
        out: (Long, IndexedSeq[Value]) => Unit): Unit = {
      if (depth > 32) throw SqFail
      // b-tree pages are never shared: a revisit is a cycle bomb
      if (page >= 1 && page <= maxPage && seen.get(page.toInt))
        throw SqFail
      if (page >= 1 && page <= maxPage) seen.set(page.toInt)
      val base = pageOff(page)
      val hdr = base + (if (page == 1) 100 else 0)
      val tpe = b(hdr) & 0xff
      val nCells = u16(b, hdr + 3)
      if (nCells > usable / 2) throw SqFail
      val ptrs = hdr + (if (tpe == 0x05) 12 else 8)
      val pageEnd = base + usable
      tpe match {
        case 0x0d => // table leaf
          var i = 0
          while (i < nCells) {
            val off = base + u16(b, ptrs + i * 2)
            if (off < hdr || off >= pageEnd) throw SqFail
            val (len, n1) = varint(b, off)
            val (rowid, n2) = varint(b, off + n1)
            out(rowid, record(payload(off + n1 + n2, pageEnd, len)))
            i += 1
          }
        case 0x05 => // table interior
          var i = 0
          while (i < nCells) {
            val off = base + u16(b, ptrs + i * 2)
            if (off < hdr || off + 4 > pageEnd) throw SqFail
            walkTable0(u32(b, off), depth + 1, seen, out)
            i += 1
          }
          walkTable0(u32(b, hdr + 8), depth + 1, seen, out)
        case _ => throw SqFail // index pages never root a table
      }
    }
  }

  /** Parse a database: schema tables + all their rows. None on
    * non-SQLite bytes, UTF-16 encodings, or structural damage.
    */
  def sqliteRead(bytes: Array[Byte]): Option[SqDoc] = {
    try {
      val db = new Db(
        if (bytes == null) throw SqFail else bytes)
      val tables = scala.collection.mutable.ArrayBuffer[SqTable]()
      var count = 0
      db.walkTable(1, 0, (_, rec) => {
        count += 1
        if (count > MaxRows) throw SqFail
        // sqlite_schema: (type, name, tbl_name, rootpage, sql)
        if (rec.length >= 5) (rec(0), rec(1), rec(3)) match {
          case (t: String, name: String, rp: Long) if t == "table" =>
            val sql = rec(4) match {
              case s: String => s
              case _ => ""
            }
            tables += SqTable(name, rp.toInt, sql)
          case _ => ()
        }
      })
      val rows = tables.map { t =>
        val rs = scala.collection.mutable
          .ArrayBuffer[(Long, IndexedSeq[Value])]()
        db.walkTable(t.rootPage.toLong, 0, (rowid, rec) => {
          rs += ((rowid, rec))
          if (rs.length > MaxRows) throw SqFail
        })
        t.name -> rs.toSeq
      }.toMap
      Some(SqDoc(tables.toSeq, rows))
    } catch {
      case SqFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: OutOfMemoryError => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer: a real multi-page database with an overflow chain
  // ------------------------------------------------------------------

  private def wVarint(v: Long): Array[Byte] = {
    if (v < 0) throw SqFail
    if (v == 0) return Array[Byte](0)
    val groups = scala.collection.mutable.ArrayBuffer[Int]()
    var x = v
    while (x > 0) { groups += (x & 0x7f).toInt; x >>= 7 }
    val out = groups.reverse.zipWithIndex.map { case (g, i) =>
      (if (i < groups.length - 1) (g | 0x80) else g).toByte
    }
    out.toArray
  }

  /** Serialize one record (values: null / Long / Double / String /
    * Array[Byte]) — always the general serial types, never 8/9, so
    * the reader's constant handling is exercised separately.
    */
  private def wRecord(values: Seq[Value]): Array[Byte] = {
    val bodies = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val types = values.map {
      case null => bodies += Array.emptyByteArray; 0L
      case v: Long =>
        val be = new Array[Byte](8)
        var x = v
        for (i <- 7 to 0 by -1) { be(i) = (x & 0xff).toByte; x >>= 8 }
        bodies += be; 6L
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val be = new Array[Byte](8)
        var x = bits
        for (i <- 7 to 0 by -1) { be(i) = (x & 0xff).toByte; x >>= 8 }
        bodies += be; 7L
      case s: String =>
        val u = s.getBytes(StandardCharsets.UTF_8)
        bodies += u; 13L + 2 * u.length
      case a: Array[Byte] => bodies += a; 12L + 2 * a.length
      case _ => throw SqFail
    }
    val typeBytes = types.map(wVarint)
    // header length varint counts itself — iterate to the fixpoint
    val tlen = typeBytes.map(_.length).sum
    var hl = tlen + 1
    while (wVarint(hl.toLong).length + tlen != hl)
      hl = tlen + wVarint(hl.toLong).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(wVarint(hl.toLong))
    typeBytes.foreach(t => out.write(t))
    bodies.foreach(bb => out.write(bb))
    out.toByteArray
  }

  private val PageSize = 512

  /** One leaf page from (rowid, record) cells; returns the page and
    * any overflow pages (appended by the caller at known page
    * numbers — `nextOverflowPage` supplies the numbering).
    */
  private def leafPage(cells: Seq[(Long, Array[Byte])],
      nextOverflowPage: () => Int,
      overflow: scala.collection.mutable.ArrayBuffer[Array[Byte]],
      page1Header: Boolean): Array[Byte] = {
    val u = PageSize
    val x = u - 35
    val m = ((u - 12) * 32 / 255) - 23
    val hdrOff = if (page1Header) 100 else 0
    val page = new Array[Byte](PageSize)
    page(hdrOff) = 0x0d
    val nCells = cells.length
    page(hdrOff + 3) = ((nCells >> 8) & 0xff).toByte
    page(hdrOff + 4) = (nCells & 0xff).toByte
    var content = PageSize
    val ptrs = hdrOff + 8
    for (((rowid, rec), i) <- cells.zipWithIndex) {
      val p = rec.length.toLong
      val inline =
        if (p <= x) p.toInt
        else {
          val k = m + ((p - m) % (u - 4))
          (if (k <= x) k else m.toLong).toInt
        }
      val lenV = wVarint(p)
      val ridV = wVarint(rowid)
      val cellLen = lenV.length + ridV.length + inline +
        (if (inline < p) 4 else 0)
      content -= cellLen
      if (content < ptrs + nCells * 2) throw SqFail
      var o = content
      System.arraycopy(lenV, 0, page, o, lenV.length)
      o += lenV.length
      System.arraycopy(ridV, 0, page, o, ridV.length)
      o += ridV.length
      System.arraycopy(rec, 0, page, o, inline)
      o += inline
      if (inline < p) {
        // overflow chain: (u-4)-byte chunks
        var rest = rec.length - inline
        var src = inline
        val chunkPages = scala.collection.mutable
          .ArrayBuffer[Array[Byte]]()
        val firstPage = nextOverflowPage()
        var pageNo = firstPage
        page(o) = ((pageNo >> 24) & 0xff).toByte
        page(o + 1) = ((pageNo >> 16) & 0xff).toByte
        page(o + 2) = ((pageNo >> 8) & 0xff).toByte
        page(o + 3) = (pageNo & 0xff).toByte
        while (rest > 0) {
          val take = math.min(rest, u - 4)
          val op = new Array[Byte](PageSize)
          System.arraycopy(rec, src, op, 4, take)
          src += take
          rest -= take
          val next = if (rest > 0) nextOverflowPage() else 0
          op(0) = ((next >> 24) & 0xff).toByte
          op(1) = ((next >> 16) & 0xff).toByte
          op(2) = ((next >> 8) & 0xff).toByte
          op(3) = (next & 0xff).toByte
          chunkPages += op
          pageNo = next
        }
        overflow ++= chunkPages
      }
      page(ptrs + i * 2) = ((content >> 8) & 0xff).toByte
      page(ptrs + i * 2 + 1) = (content & 0xff).toByte
    }
    page(hdrOff + 5) = ((content >> 8) & 0xff).toByte
    page(hdrOff + 6) = (content & 0xff).toByte
    page
  }

  private def interiorPage(children: Seq[(Int, Long)],
      rightMost: Int): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    page(0) = 0x05
    val nCells = children.length
    page(3) = ((nCells >> 8) & 0xff).toByte
    page(4) = (nCells & 0xff).toByte
    page(8) = ((rightMost >> 24) & 0xff).toByte
    page(9) = ((rightMost >> 16) & 0xff).toByte
    page(10) = ((rightMost >> 8) & 0xff).toByte
    page(11) = (rightMost & 0xff).toByte
    var content = PageSize
    for (((child, key), i) <- children.zipWithIndex) {
      val kv = wVarint(key)
      content -= 4 + kv.length
      page(content) = ((child >> 24) & 0xff).toByte
      page(content + 1) = ((child >> 16) & 0xff).toByte
      page(content + 2) = ((child >> 8) & 0xff).toByte
      page(content + 3) = (child & 0xff).toByte
      System.arraycopy(kv, 0, page, content + 4, kv.length)
      page(12 + i * 2) = ((content >> 8) & 0xff).toByte
      page(12 + i * 2 + 1) = (content & 0xff).toByte
    }
    page(5) = ((content >> 8) & 0xff).toByte
    page(6) = (content & 0xff).toByte
    page
  }

  /** Inline bytes + cell length for one (rowid, record) on a table
    * leaf — the same X/M/K arithmetic the reader inverts.
    */
  private def cellSize(rowid: Long, rec: Array[Byte]): Int = {
    val u = PageSize
    val x = u - 35
    val m = ((u - 12) * 32 / 255) - 23
    val p = rec.length.toLong
    val inline =
      if (p <= x) p.toInt
      else {
        val k = m + ((p - m) % (u - 4))
        (if (k <= x) k else m.toLong).toInt
      }
    wVarint(p).length + wVarint(rowid).length + inline +
      (if (inline < p) 4 else 0)
  }

  /** A real SQLite file with one table `docs(id, body)`:
    * page 1 = header + sqlite_schema leaf; page 2 = the table's
    * INTERIOR root; leaves packed greedily from page 3 (≥2 leaves
    * whenever ≥2 rows — the interior walk always exercises); long
    * bodies ride OVERFLOW chains numbered after the leaves. `rows`
    * are (rowid, id, body) in ascending rowid order.
    */
  def sqliteWrite(rows: Seq[(Long, Long, String)]): Array[Byte] = {
    require(rows.size >= 2, "the interior layout needs >= 2 rows")
    val recs = rows.map { case (rid, id, body) =>
      (rid, wRecord(Seq[Value](id, body)))
    }
    // greedy pagination: usable 512 − 8 header − 2/cell pointers
    val groups = scala.collection.mutable
      .ArrayBuffer[Vector[(Long, Array[Byte])]]()
    var cur = Vector.empty[(Long, Array[Byte])]
    var used = 0
    for ((rid, rec) <- recs) {
      val c = cellSize(rid, rec) + 2
      if (cur.nonEmpty && 8 + used + c > PageSize) {
        groups += cur; cur = Vector.empty; used = 0
      }
      cur = cur :+ ((rid, rec))
      used += c
    }
    if (cur.nonEmpty) groups += cur
    // force ≥2 leaves so the interior page always has work
    if (groups.length == 1 && groups.head.length >= 2) {
      val g = groups.remove(0)
      val cut = (g.length + 1) / 2
      groups += g.take(cut); groups += g.drop(cut)
    }
    if (groups.length < 2) throw SqFail
    // pages: 1 schema, 2 root, 3..2+L leaves, then overflow
    var nextPage = 3 + groups.length
    val overflow = scala.collection.mutable
      .ArrayBuffer[Array[Byte]]()
    val alloc = () => { val p = nextPage; nextPage += 1; p }
    val leaves = groups.map(g =>
      leafPage(g, alloc, overflow, page1Header = false))
    val root = interiorPage(
      groups.init.zipWithIndex.map { case (g, i) =>
        (3 + i, g.last._1)
      }.toSeq, 3 + groups.length - 1)
    val schemaRec = wRecord(Seq[Value]("table", "docs", "docs",
      2L, "CREATE TABLE docs(id INTEGER, body TEXT)"))
    val page1 = leafPage(Seq((1L, schemaRec)), alloc, overflow,
      page1Header = true)
    val nPages = 2 + groups.length + overflow.length
    // header
    val h = page1 // header lives in page 1's first 100 bytes
    val magic = "SQLite format 3\u0000"
      .getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(magic, 0, h, 0, 16)
    h(16) = ((PageSize >> 8) & 0xff).toByte
    h(17) = (PageSize & 0xff).toByte
    h(18) = 1; h(19) = 1 // legacy journal
    h(21) = 64; h(22) = 32; h(23) = 32
    h(27) = 1 // change counter = 1
    h(28) = ((nPages >> 24) & 0xff).toByte
    h(29) = ((nPages >> 16) & 0xff).toByte
    h(30) = ((nPages >> 8) & 0xff).toByte
    h(31) = (nPages & 0xff).toByte
    h(47) = 4 // schema format 4
    h(59) = 1 // text encoding UTF-8
    h(95) = 1 // version-valid-for
    h(96) = 0x03; h(97) = 0x2e.toByte // "sqlite version" 3.x-ish
    val out = new java.io.ByteArrayOutputStream(nPages * PageSize)
    out.write(page1); out.write(root)
    leaves.foreach(out.write)
    overflow.foreach(out.write)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val sqliteSchema: StructType = StructType(Seq(
    StructField("db_text", StringType),
    StructField("n_rows", IntegerType),
    StructField("n_tables", IntegerType),
    StructField("int_sum", LongType)))

  /** Decode kernel: text cells of every table concatenated in rowid
    * order, row census, table census, exact integer-column sum.
    */
  def decodeSqlite(bytes: Array[Byte]): Seq[Any] =
    sqliteRead(bytes) match {
      case Some(SqDoc(tables, rows)) =>
        val sb = new java.lang.StringBuilder
        var n = 0
        var isum = 0L
        tables.foreach { t =>
          rows(t.name).foreach { case (_, rec) =>
            n += 1
            rec.foreach {
              case s: String => sb.append(s)
              case l: Long => isum += l
              case _ => ()
            }
          }
        }
        Seq[Any](sb.toString, n, tables.length, isum)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row database synthesizer (map-only): the row's text split
    * across two rows on separate leaves, plus a deterministic long
    * third row that rides the overflow chain.
    */
  def synthSqlite(df: DataFrame, idCol: String, textCol: String,
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
        val cut = {
          var c = text.length / 2
          if (c > 0 && c < text.length &&
            Character.isHighSurrogate(text.charAt(c - 1)) &&
            Character.isLowSurrogate(text.charAt(c))) c += 1
          c
        }
        val pad = "pad:" + ("x" * 600)
        val bytes = sqliteWrite(Seq(
          (1L, id * 3 + 1, text.substring(0, cut)),
          (2L, id * 3 + 2, text.substring(cut)),
          (3L, id * 3 + 3, pad)))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
