package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Legacy Excel 97+ (.xls, BIFF8) cell extraction over the MS-CFB
  * walk ([[Cfb.cfbStreams]]).
  *
  * The reference repo ingests tabular files only as CSV
  * (`/root/reference/src/trousse/dataset.py:341` reads CSV); a crawl
  * corpus carries decades of spreadsheets in the binary BIFF8 format,
  * which previously only earned a `ms-excel` label (Cfb.scala:186).
  * This module walks the `Workbook` stream's record sequence for real:
  *
  *  - BOF/EOF substream structure ([MS-XLS] 2.4.21): a globals
  *    substream (BOF dt=0x0005) followed by one worksheet substream
  *    per BoundSheet8, located by its absolute `lbPlyPos`.
  *  - The shared-string table (SST, 2.4.265) with its CONTINUE
  *    records — including the format's hardest rule: a string's
  *    character data may straddle a record boundary, and each
  *    continued fragment re-declares its own `fHighByte` flag byte,
  *    so one string can switch between 1-byte-latin1 and UTF-16LE
  *    encodings mid-string (2.5.293). Rich-run and ExtRst payloads
  *    are length-skipped (no grbit byte on non-character data).
  *  - Cell records: LABELSST (isst into the SST), LABEL (inline
  *    string), NUMBER (IEEE double), RK and MULRK (the packed
  *    30-bit-int / truncated-double / ×100 encoding, 2.5.276).
  *  - FilePass (encryption) refuses with None — never garbage.
  *
  * BIFF5/7 workbooks (stream named `Book`, BOF vers != 0x0600) refuse:
  * their SST-less LABEL records use a different string layout and a
  * guessed decode would be silently wrong on real files.
  *
  * Everything is per-row byte work inside the shared
  * [[Multimodal.decodeBatches]] plumbing — map-only, no shuffle, no
  * driver loops; at 100 TB it scales with input bytes like the other
  * codecs.
  */
object Xls {

  private object XlsFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  private def le16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw XlsFail
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def le32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw XlsFail
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** One decoded cell: sheet index, row, column, text (null for
    * numeric cells), numeric value in exact centi-units (null for
    * text cells and non-representable doubles).
    */
  final case class XlsCell(sheet: Int, row: Int, col: Int,
      text: String, centi: Option[Long])

  /** Decoded workbook: ordered sheet names, cells in (sheet, row,
    * col) stream order, shared-string count.
    */
  final case class XlsDoc(sheetNames: Seq[String],
      cells: Seq[XlsCell], nSharedStrings: Int)

  // record ids
  private val RecBof = 0x0809
  private val RecEof = 0x000a
  private val RecFilePass = 0x002f
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00fc
  private val RecContinue = 0x003c
  private val RecLabelSst = 0x00fd
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027e
  private val RecMulRk = 0x00bd

  /** RK value → exact centi-units (value × 100) when representable:
    * 30-bit signed int (×100 exact), ×100-flagged int (already
    * centi), or a truncated double whose ×100 is integral; other
    * doubles → None (never a rounded lie).
    */
  def rkToCenti(rk: Long): Option[Long] = {
    val fX100 = (rk & 1L) != 0
    val fInt = (rk & 2L) != 0
    if (fInt) {
      // sign-extend the top 30 bits
      val v = (rk << 32) >> 34
      Some(if (fX100) v else v * 100L)
    } else {
      val d0 = java.lang.Double.longBitsToDouble((rk & ~3L) << 32)
      val d = if (fX100) d0 / 100.0 else d0
      val c = d * 100.0
      if (c == Math.rint(c) && Math.abs(c) < (1L << 52).toDouble)
        Some(c.toLong)
      else None
    }
  }

  /** Cursor over the concatenation of an SST record's payload and its
    * CONTINUE payloads, honoring the per-fragment `fHighByte` re-read
    * rule for character data and plain byte continuation for
    * everything else.
    */
  private final class SegCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def segRemaining: Int =
      if (si >= segs.length) 0 else segs(si).length - off
    private def advanceSeg(): Unit = { si += 1; off = 0 }
    def atEnd: Boolean = {
      while (si < segs.length && segRemaining == 0) advanceSeg()
      si >= segs.length
    }
    /** Raw byte (non-character data — no grbit at boundaries). */
    def u8(): Int = {
      if (atEnd) throw XlsFail
      val v = segs(si)(off) & 0xff
      off += 1
      v
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long =
      u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      if (n < 0) throw XlsFail
      var left = n
      while (left > 0) {
        if (atEnd) throw XlsFail
        val take = math.min(left, segRemaining.toLong).toInt
        off += take
        left -= take
      }
    }
    /** Read `cch` 16-bit character units starting at width `wide0`.
      * Whenever character reading exhausts a fragment with units
      * still owed, the next fragment begins with a fresh
      * option-flags byte whose bit 0 re-declares the width — one
      * string can switch 1-byte/2-byte encodings mid-string
      * ([MS-XLS] 2.5.293; this matches the continued-fragment rule
      * Excel and POI implement, including a split that falls
      * exactly between the header and the first character).
      */
    def chars(cch: Int, wide0: Boolean): String = {
      if (cch < 0 || cch > MaxText) throw XlsFail
      val sb = new java.lang.StringBuilder(math.min(cch, 1 << 16))
      var wide = wide0
      var left = cch
      while (left > 0) {
        if (segRemaining == 0) {
          // crossed into a continue fragment with chars still owed
          advanceSeg()
          while (si < segs.length && segs(si).length == 0)
            advanceSeg()
          if (si >= segs.length) throw XlsFail
          wide = (segs(si)(off) & 1) != 0
          off += 1
        }
        val unit = if (wide) 2 else 1
        if (segRemaining < unit) throw XlsFail // mid-char split
        val take = math.min(left, segRemaining / unit)
        if (wide) {
          sb.append(new String(segs(si), off, take * 2,
            StandardCharsets.UTF_16LE))
        } else {
          var k = 0
          while (k < take) {
            sb.append(((segs(si)(off + k) & 0xff)).toChar)
            k += 1
          }
        }
        off += take * unit
        left -= take
      }
      sb.toString
    }
  }

  /** Parse the SST record (+ its CONTINUE payloads) to the
    * shared-string list.
    */
  private def parseSst(segs: IndexedSeq[Array[Byte]])
      : IndexedSeq[String] = {
    val cur = new SegCursor(segs)
    cur.skip(4) // cstTotal
    val cstUnique = cur.u32()
    if (cstUnique < 0 || cstUnique > (1 << 22)) throw XlsFail
    val out = new scala.collection.mutable.ArrayBuffer[String](
      cstUnique.toInt)
    var i = 0L
    while (i < cstUnique) {
      val cch = cur.u16()
      val grbit = cur.u8()
      if ((grbit & 0xf2) != 0) throw XlsFail // reserved bits
      val wide = (grbit & 0x01) != 0
      val fExt = (grbit & 0x04) != 0
      val fRich = (grbit & 0x08) != 0
      val cRun = if (fRich) cur.u16() else 0
      val cbExt = if (fExt) cur.u32() else 0L
      out += cur.chars(cch, wide)
      cur.skip(cRun.toLong * 4) // FormatRun pairs
      cur.skip(cbExt) // ExtRst
      i += 1
    }
    out.toIndexedSeq
  }

  /** Walk a BIFF8 workbook to sheets + cells. None for non-CFB
    * bytes, missing/BIFF5 workbook streams, encryption, or
    * structural damage.
    */
  def xlsCells(b: Array[Byte]): Option[XlsDoc] = {
    val doc = Cfb.cfbStreams(b).getOrElse(return None)
    // "Book" is BIFF5/7 — different record layouts; refuse rather
    // than guess (Cfb already labels it ms-excel for triage)
    val wb = doc.streams.find(_.name == "Workbook")
      .map(_.data).getOrElse(return None)
    try {
      // --- globals substream
      if (le16(wb, 0) != RecBof) throw XlsFail
      if (le16(wb, 4) != 0x0600) throw XlsFail // BIFF8 only
      if (le16(wb, 6) != 0x0005) throw XlsFail // workbook globals
      var p = 4 + le16(wb, 2)
      final case class Sheet(name: String, pos: Long)
      val sheets = scala.collection.mutable.ArrayBuffer[Sheet]()
      var sst: IndexedSeq[String] = IndexedSeq.empty
      var done = false
      while (!done) {
        val id = le16(wb, p)
        val len = le16(wb, p + 2)
        val body = p + 4
        if (body + len > wb.length) throw XlsFail
        id match {
          case RecEof => done = true
          case RecFilePass => throw XlsFail // encrypted
          case RecBoundSheet =>
            val pos = le32(wb, body)
            val dt = wb(body + 5) & 0xff
            val cch = wb(body + 6) & 0xff
            val wide = (wb(body + 7) & 1) != 0
            val name =
              if (wide) new String(wb, body + 8, cch * 2,
                StandardCharsets.UTF_16LE)
              else {
                val sb = new java.lang.StringBuilder(cch)
                var k = 0
                while (k < cch) {
                  sb.append((wb(body + 8 + k) & 0xff).toChar)
                  k += 1
                }
                sb.toString
              }
            if (dt == 0) sheets += Sheet(name, pos)
          case RecSst =>
            // collect the SST payload + immediately-following
            // CONTINUE payloads
            val segs =
              scala.collection.mutable.ArrayBuffer[Array[Byte]]()
            segs += java.util.Arrays.copyOfRange(wb, body, body + len)
            var q = body + len
            var cid = if (q + 4 <= wb.length) le16(wb, q) else -1
            while (cid == RecContinue) {
              val clen = le16(wb, q + 2)
              if (q + 4 + clen > wb.length) throw XlsFail
              segs += java.util.Arrays.copyOfRange(wb, q + 4,
                q + 4 + clen)
              q += 4 + clen
              cid = if (q + 4 <= wb.length) le16(wb, q) else -1
            }
            sst = parseSst(segs.toIndexedSeq)
          case _ => ()
        }
        if (id != RecEof) {
          p = body + len
          // skip any CONTINUEs already consumed by SST above
          if (id == RecSst) {
            while (p + 4 <= wb.length && le16(wb, p) == RecContinue)
              p = p + 4 + le16(wb, p + 2)
          }
        }
      }
      // --- worksheet substreams
      val cells = scala.collection.mutable.ArrayBuffer[XlsCell]()
      var totalText = 0L
      for ((sh, si) <- sheets.zipWithIndex) {
        var p = sh.pos.toInt
        if (le16(wb, p) != RecBof) throw XlsFail
        if (le16(wb, p + 6) != 0x0010) throw XlsFail // worksheet
        p = p + 4 + le16(wb, p + 2)
        var done = false
        while (!done) {
          val id = le16(wb, p)
          val len = le16(wb, p + 2)
          val body = p + 4
          if (body + len > wb.length) throw XlsFail
          id match {
            case RecEof => done = true
            case RecLabelSst =>
              val rw = le16(wb, body)
              val col = le16(wb, body + 2)
              val isst = le32(wb, body + 6)
              if (isst < 0 || isst >= sst.length) throw XlsFail
              val t = sst(isst.toInt)
              totalText += t.length
              if (totalText > MaxText) throw XlsFail
              cells += XlsCell(si, rw, col, t, None)
            case RecLabel =>
              val rw = le16(wb, body)
              val col = le16(wb, body + 2)
              val cch = le16(wb, body + 6)
              val wide = (wb(body + 8) & 1) != 0
              val end = body + 9 + cch * (if (wide) 2 else 1)
              if (end > body + len) throw XlsFail
              val t =
                if (wide) new String(wb, body + 9, cch * 2,
                  StandardCharsets.UTF_16LE)
                else {
                  val sb = new java.lang.StringBuilder(cch)
                  var k = 0
                  while (k < cch) {
                    sb.append((wb(body + 9 + k) & 0xff).toChar)
                    k += 1
                  }
                  sb.toString
                }
              totalText += t.length
              if (totalText > MaxText) throw XlsFail
              cells += XlsCell(si, rw, col, t, None)
            case RecNumber =>
              val rw = le16(wb, body)
              val col = le16(wb, body + 2)
              val bits = le32(wb, body + 6) |
                (le32(wb, body + 10) << 32)
              val d = java.lang.Double.longBitsToDouble(bits)
              val c = d * 100.0
              val centi =
                if (c == Math.rint(c) &&
                  Math.abs(c) < (1L << 52).toDouble) Some(c.toLong)
                else None
              cells += XlsCell(si, rw, col, null, centi)
            case RecRk =>
              val rw = le16(wb, body)
              val col = le16(wb, body + 2)
              val rk = le32(wb, body + 6)
              cells += XlsCell(si, rw, col, null, rkToCenti(rk))
            case RecMulRk =>
              val rw = le16(wb, body)
              val colFirst = le16(wb, body + 2)
              val n = (len - 6) / 6
              if (n <= 0 || len != 6 + n * 6) throw XlsFail
              var k = 0
              while (k < n) {
                val rk = le32(wb, body + 4 + k * 6 + 2)
                cells += XlsCell(si, rw, colFirst + k, null,
                  rkToCenti(rk))
                k += 1
              }
            case _ => ()
          }
          if (id != RecEof) p = body + len
          if (cells.length > (1 << 22)) throw XlsFail
        }
      }
      Some(XlsDoc(sheets.map(_.name).toSeq, cells.toSeq,
        sst.length))
    } catch {
      case XlsFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer: a real two-sheet BIFF8 workbook
  // ------------------------------------------------------------------

  private[graft] def rec(id: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + body.length)
    out(0) = (id & 0xff).toByte
    out(1) = ((id >> 8) & 0xff).toByte
    out(2) = (body.length & 0xff).toByte
    out(3) = ((body.length >> 8) & 0xff).toByte
    System.arraycopy(body, 0, out, 4, body.length)
    out
  }
  private[graft] def p16(a: Array[Byte], o: Int, v: Int): Unit = {
    a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private[graft] def p32(a: Array[Byte], o: Int, v: Long): Unit = {
    a(o) = (v & 0xff).toByte
    a(o + 1) = ((v >> 8) & 0xff).toByte
    a(o + 2) = ((v >> 16) & 0xff).toByte
    a(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private[graft] def bof(dt: Int): Array[Byte] = {
    val b = new Array[Byte](16)
    p16(b, 0, 0x0600); p16(b, 2, dt)
    p16(b, 4, 0x0dbb); p16(b, 6, 0x07cc)
    rec(RecBof, b)
  }
  private def latin1able(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x100) return false
      i += 1
    }
    true
  }
  private def charBytes(s: String, wide: Boolean): Array[Byte] =
    if (wide) s.getBytes(StandardCharsets.UTF_16LE)
    else {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) { out(i) = s.charAt(i).toByte; i += 1 }
      out
    }

  /** SST + CONTINUE for the given strings. The LAST string with
    * length ≥ 2 is split mid-string across the SST/CONTINUE
    * boundary, each fragment carrying its own width flag — the
    * straddle rule a real reader must implement. The FIRST string
    * carries an (ignorable) rich-format run.
    */
  def sstWrite(strings: Seq[String]): Array[Byte] = {
    // a straddle needs a non-empty tail fragment: cut at len/2
    // (surrogate-adjusted) must leave chars on both sides
    val straddleIdx = strings.lastIndexWhere { s =>
      if (s.length < 2) false
      else {
        var c = s.length / 2
        if (Character.isHighSurrogate(s.charAt(c - 1)) &&
          Character.isLowSurrogate(s.charAt(c))) c += 1
        c < s.length
      }
    }
    val sstBody = new java.io.ByteArrayOutputStream()
    val contBody = new java.io.ByteArrayOutputStream()
    val head = new Array[Byte](8)
    p32(head, 0, strings.length.toLong)
    p32(head, 4, strings.length.toLong)
    sstBody.write(head, 0, 8)
    for ((s, i) <- strings.zipWithIndex) {
      val rich = i == 0
      if (i == straddleIdx) {
        // split near the middle without cutting a surrogate pair
        var cut = s.length / 2
        if (cut > 0 && cut < s.length &&
          Character.isHighSurrogate(s.charAt(cut - 1)) &&
          Character.isLowSurrogate(s.charAt(cut))) cut += 1
        val (a, bb) = (s.substring(0, cut), s.substring(cut))
        val wa = !latin1able(a)
        val wb = !latin1able(bb)
        val hdr = new Array[Byte](3 + (if (rich) 2 else 0))
        p16(hdr, 0, s.length)
        hdr(2) = ((if (wa) 1 else 0) | (if (rich) 8 else 0)).toByte
        if (rich) p16(hdr, 3, 1)
        sstBody.write(hdr, 0, hdr.length)
        val ab = charBytes(a, wa)
        sstBody.write(ab, 0, ab.length)
        // continue fragment: fresh width flag byte + remaining chars
        contBody.write(if (wb) 1 else 0)
        val bbb = charBytes(bb, wb)
        contBody.write(bbb, 0, bbb.length)
        if (rich) contBody.write(Array[Byte](0, 0, 0, 0), 0, 4)
      } else {
        val target =
          if (straddleIdx >= 0 && i > straddleIdx) contBody
          else sstBody
        val wide = !latin1able(s)
        val hdr = new Array[Byte](3 + (if (rich) 2 else 0))
        p16(hdr, 0, s.length)
        hdr(2) = ((if (wide) 1 else 0) | (if (rich) 8 else 0)).toByte
        if (rich) p16(hdr, 3, 1)
        target.write(hdr, 0, hdr.length)
        val cb = charBytes(s, wide)
        target.write(cb, 0, cb.length)
        if (rich) target.write(Array[Byte](0, 0, 0, 0), 0, 4)
      }
    }
    val sstRec = rec(RecSst, sstBody.toByteArray)
    if (contBody.size() == 0) sstRec
    else sstRec ++ rec(RecContinue, contBody.toByteArray)
  }

  /** A real two-sheet BIFF8 .xls: `Data` holds the text split across
    * shared strings (one straddling a Continue boundary), `Numbers`
    * holds RK / RK×100 / MULRK / NUMBER cells derived from `seed` —
    * every numeric encoding the reader supports, all exact in
    * centi-units.
    */
  def xlsWrite(text: String, seed: Long): Array[Byte] = {
    val cut = {
      var c = text.length / 2
      if (c > 0 && c < text.length &&
        Character.isHighSurrogate(text.charAt(c - 1)) &&
        Character.isLowSurrogate(text.charAt(c))) c += 1
      c
    }
    val pieces0 = Seq(text.substring(0, cut), text.substring(cut))
      .filter(_.nonEmpty)
    val strings = if (pieces0.isEmpty) Seq("") else pieces0

    // sheet substreams
    val dataCells = strings.zipWithIndex.map { case (_, i) =>
      val b = new Array[Byte](10)
      p16(b, 0, 0); p16(b, 2, i); p16(b, 4, 15)
      p32(b, 6, i.toLong)
      rec(RecLabelSst, b)
    }
    val sheet1 = bof(0x0010) ++
      dataCells.fold(Array.emptyByteArray)(_ ++ _) ++
      rec(RecEof, Array.emptyByteArray)

    // an RK integer holds 30 signed bits; a fixture value beyond that
    // would silently wrap and stop matching the closed-form SQL oracle
    // at larger scale factors — fail loudly instead
    def rk30(v: Long, tag: Long): Long = {
      require(v >= -(1L << 29) && v < (1L << 29),
        s"RK fixture value $v exceeds the 30-bit RK integer range")
      ((v << 2) & 0xffffffffL) | tag
    }
    def rkInt(v: Long): Long = rk30(v, 2L)
    def rkCenti(v: Long): Long = rk30(v, 3L)
    val rk1 = { // RK int: seed*7+1
      val b = new Array[Byte](10)
      p16(b, 0, 0); p16(b, 2, 0); p16(b, 4, 15)
      p32(b, 6, rkInt(seed * 7 + 1))
      rec(RecRk, b)
    }
    val rk2 = { // RK ×100 int: value (seed*13+3)/100
      val b = new Array[Byte](10)
      p16(b, 0, 0); p16(b, 2, 1); p16(b, 4, 15)
      p32(b, 6, rkCenti(seed * 13 + 3))
      rec(RecRk, b)
    }
    val mul = { // MULRK: two int RKs at cols 2,3
      val b = new Array[Byte](4 + 2 * 6 + 2)
      p16(b, 0, 1); p16(b, 2, 2)
      p16(b, 4, 15); p32(b, 6, rkInt(seed + 5))
      p16(b, 10, 15); p32(b, 12, rkInt(seed + 6))
      p16(b, 16, 3)
      rec(RecMulRk, b)
    }
    val num = { // NUMBER double: seed*2
      val b = new Array[Byte](14)
      p16(b, 0, 2); p16(b, 2, 0); p16(b, 4, 15)
      val bits =
        java.lang.Double.doubleToLongBits((seed * 2).toDouble)
      p32(b, 6, bits & 0xffffffffL)
      p32(b, 10, bits >>> 32)
      rec(RecNumber, b)
    }
    val sheet2 = bof(0x0010) ++ rk1 ++ rk2 ++ mul ++ num ++
      rec(RecEof, Array.emptyByteArray)

    // globals: BOF + 2×BoundSheet8 + SST + EOF, sheet offsets patched
    def boundSheet(name: String): Array[Byte] = {
      val nb = charBytes(name, wide = false)
      val b = new Array[Byte](8 + nb.length)
      p32(b, 0, 0L) // lbPlyPos patched below
      b(4) = 0; b(5) = 0 // visible worksheet
      b(6) = name.length.toByte
      b(7) = 0
      System.arraycopy(nb, 0, b, 8, nb.length)
      rec(RecBoundSheet, b)
    }
    val bs1 = boundSheet("Data")
    val bs2 = boundSheet("Numbers")
    val sst = sstWrite(strings)
    val globals = bof(0x0005) ++ bs1 ++ bs2 ++ sst ++
      rec(RecEof, Array.emptyByteArray)
    val wb = globals ++ sheet1 ++ sheet2
    // patch lbPlyPos (body offset 0 of each BoundSheet8)
    val bs1Off = 16 + 4 + 4 // after BOF record, into bs1 body
    p32(wb, bs1Off, globals.length.toLong)
    p32(wb, bs1Off + bs1.length, (globals.length +
      sheet1.length).toLong)
    Cfb.cfbWrite(Seq(
      ("Workbook", wb),
      ("SummaryInformation",
        ("xls " + seed).getBytes(StandardCharsets.UTF_8))))
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val xlsSchema: StructType = StructType(Seq(
    StructField("xls_text", StringType),
    StructField("sheet_names", StringType),
    StructField("rk_centi_sum", LongType),
    StructField("n_cells", IntegerType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]: text cells
    * concatenated in stream order, sheet census, exact centi-unit
    * numeric sum.
    */
  def decodeXls(bytes: Array[Byte]): Seq[Any] =
    xlsCells(bytes) match {
      case Some(XlsDoc(sheets, cells, _)) =>
        val sb = new java.lang.StringBuilder
        var centi = 0L
        cells.foreach { c =>
          if (c.text != null) sb.append(c.text)
          c.centi.foreach(centi += _)
        }
        Seq[Any](sb.toString, sheets.mkString(","), centi,
          cells.length)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row .xls synthesizer (map-only). */
  def synthXls(df: DataFrame, idCol: String, textCol: String,
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
        Row.fromSeq(r.toSeq :+ xlsWrite(text, id))
      }
    }(enc)
  }
}
