package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** dBase .dbf table reading (dBase III/IV layout — the fixed-width
  * ancestor of CSV; GIS shapefiles carry their attribute tables as
  * .dbf to this day, so the format is still a live crawl
  * population).
  *
  * The reference repo reads CSV only
  * (`/root/reference/src/trousse/dataset.py:341`); this gives the
  * same tabular ingestion to the binary sibling. From the public
  * layout (the dBase header is one of the oldest documented binary
  * table formats):
  *
  *  - 32-byte header: version byte (dBase III 0x03/0x83, IV
  *    0x04/0x8B accepted), u32le record count, u16le header size,
  *    u16le record size — all three cross-checked against the
  *    actual byte length (a lying header refuses).
  *  - 32-byte field descriptors to the 0x0D terminator: 11-byte
  *    NUL-padded name, type (C character, N numeric, L logical,
  *    D date), length, decimal count. Memo (M) fields refuse —
  *    their text lives in a sidecar .dbt this payload doesn't have.
  *  - Records: deletion-flag byte (`*` rows are skipped — dBase
  *    deletes lazily), then fixed-width values; C fields trim
  *    trailing pads, N fields with 0 decimals parse as exact Long
  *    (all-blank → null, a non-numeric byte refuses), decimal N
  *    fields are returned as TEXT — never a lossy double.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Dbf {

  private object DbfFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  final case class DbfField(name: String, tpe: Char, len: Int,
      dec: Int)
  /** Decoded table: fields, live rows (deleted excluded) in file
    * order — values are String (C/D/L/decimal-N), Long (integer N),
    * or null (blank).
    */
  final case class DbfDoc(fields: Seq[DbfField],
      rows: Seq[IndexedSeq[Any]], nDeleted: Int)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a .dbf. None on alien version bytes, header/size lies,
    * memo fields, or malformed numerics.
    */
  def dbfRead(b: Array[Byte]): Option[DbfDoc] = {
    if (b == null || b.length < 33) return None
    try {
      val version = b(0) & 0xff
      if (version != 0x03 && version != 0x83 &&
        version != 0x04 && version != 0x8b) return None
      val nRec = u32(b, 4)
      val hdrSize = u16(b, 8)
      val recSize = u16(b, 10)
      if (hdrSize < 33 || hdrSize > b.length) throw DbfFail
      if (recSize < 1) throw DbfFail
      if (nRec < 0 || nRec > (1 << 24)) throw DbfFail
      // header must hold whole field descriptors + the terminator
      val fields = scala.collection.mutable.ArrayBuffer[DbfField]()
      var o = 32
      while ((b(o) & 0xff) != 0x0d) {
        if (o + 32 > hdrSize - 1) throw DbfFail
        var e = o
        while (e < o + 11 && b(e) != 0) e += 1
        val name = new String(b, o, e - o,
          java.nio.charset.StandardCharsets.US_ASCII)
        val tpe = (b(o + 11) & 0xff).toChar
        val len = b(o + 16) & 0xff
        val dec = b(o + 17) & 0xff
        tpe match {
          case 'C' | 'N' | 'L' | 'D' | 'F' => ()
          case 'M' => throw DbfFail // memo text lives in the .dbt
          case _ => throw DbfFail
        }
        if (len == 0) throw DbfFail
        fields += DbfField(name, tpe, len, dec)
        o += 32
      }
      if (fields.isEmpty) throw DbfFail
      // record size = 1 deletion byte + field widths, exactly
      if (recSize != 1 + fields.map(_.len).sum) throw DbfFail
      if (hdrSize + nRec * recSize > b.length) throw DbfFail
      val rows = scala.collection.mutable
        .ArrayBuffer[IndexedSeq[Any]]()
      var nDeleted = 0
      var total = 0L
      var r = 0L
      while (r < nRec) {
        val base = (hdrSize + r * recSize).toInt
        val flag = (b(base) & 0xff).toChar
        if (flag == '*') nDeleted += 1
        else {
          if (flag != ' ') throw DbfFail
          var p = base + 1
          val vals = fields.map { f =>
            val raw = new String(b, p, f.len,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            p += f.len
            f.tpe match {
              case 'C' =>
                // trailing pads off, leading kept (fixed-width text)
                var e = raw.length
                while (e > 0 && raw.charAt(e - 1) == ' ') e -= 1
                raw.substring(0, e)
              case 'N' | 'F' if f.dec == 0 =>
                val t = raw.trim
                if (t.isEmpty) null
                else {
                  if (!t.matches("-?[0-9]+")) throw DbfFail
                  t.toLong
                }
              case _ => raw.trim // decimal N, D, L: text, never lossy
            }
          }.toIndexedSeq
          total += vals.collect { case s: String => s.length }.sum
          if (total > MaxText) throw DbfFail
          rows += vals
        }
        r += 1
      }
      Some(DbfDoc(fields.toSeq, rows.toSeq, nDeleted))
    } catch {
      case DbfFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NumberFormatException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  /** A real dBase III table `(TITLE C(n), BODY C(n), SEQ N(10))`
    * sized to its longest value, carrying `rows` plus one
    * deleted-row decoy; the trailing 0x1A EOF marker included.
    */
  def dbfWrite(rows: Seq[(String, String, Long)]): Array[Byte] = {
    def latin1(s: String): Array[Byte] = {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        out(i) = (if (c < 0x100) c else '?').toByte
        i += 1
      }
      out
    }
    val titleLen = math.max(1,
      rows.map(_._1.length).maxOption.getOrElse(1))
    val bodyLen = math.max(1,
      rows.map(_._2.length).maxOption.getOrElse(1))
    if (titleLen > 254 || bodyLen > 254)
      throw new IllegalArgumentException("C field max 254")
    val fields = Seq(("TITLE", 'C', titleLen, 0),
      ("BODY", 'C', bodyLen, 0), ("SEQ", 'N', 10, 0))
    val recSize = 1 + fields.map(_._3).sum
    val hdrSize = 32 + fields.length * 32 + 1
    val nRec = rows.length + 1 // + the deleted decoy
    val out = new Array[Byte](hdrSize + nRec * recSize + 1)
    out(0) = 0x03
    out(1) = 126.toByte; out(2) = 8; out(3) = 15 // last update
    out(4) = (nRec & 0xff).toByte
    out(5) = ((nRec >> 8) & 0xff).toByte
    out(8) = (hdrSize & 0xff).toByte
    out(9) = ((hdrSize >> 8) & 0xff).toByte
    out(10) = (recSize & 0xff).toByte
    out(11) = ((recSize >> 8) & 0xff).toByte
    for (((name, tpe, len, dec), i) <- fields.zipWithIndex) {
      val o = 32 + i * 32
      val nb = latin1(name)
      System.arraycopy(nb, 0, out, o, nb.length)
      out(o + 11) = tpe.toByte
      out(o + 16) = len.toByte
      out(o + 17) = dec.toByte
    }
    out(32 + fields.length * 32) = 0x0d
    def putRec(idx: Int, flag: Char, title: String, body: String,
        seq: Long): Unit = {
      val base = hdrSize + idx * recSize
      out(base) = flag.toByte
      var p = base + 1
      for ((v, len) <- Seq((title, titleLen), (body, bodyLen))) {
        val vb = latin1(v.take(len))
        System.arraycopy(vb, 0, out, p, vb.length)
        java.util.Arrays.fill(out, p + vb.length, p + len, ' '.toByte)
        p += len
      }
      val s = seq.toString
      if (s.length > 10)
        throw new IllegalArgumentException("SEQ overflow")
      java.util.Arrays.fill(out, p, p + 10 - s.length, ' '.toByte)
      System.arraycopy(latin1(s), 0, out, p + 10 - s.length,
        s.length)
    }
    for (((t2, b2, s2), i) <- rows.zipWithIndex)
      putRec(i, ' ', t2, b2, s2)
    putRec(rows.length, '*', "DELETED DECOY", "never text", 0L)
    out(out.length - 1) = 0x1a
    out
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val dbfSchema: StructType = StructType(Seq(
    StructField("dbf_text", StringType),
    StructField("n_rows", IntegerType),
    StructField("n_deleted", IntegerType),
    StructField("int_sum", LongType)))

  /** Decode kernel: C-field text concatenated in row-major order,
    * live-row census, deleted census, exact integer-N sum.
    */
  def decodeDbf(bytes: Array[Byte]): Seq[Any] =
    dbfRead(bytes) match {
      case Some(DbfDoc(fields, rows, nDel)) =>
        val sb = new java.lang.StringBuilder
        var isum = 0L
        rows.foreach { vals =>
          (fields zip vals).foreach {
            case (f, s: String) if f.tpe == 'C' => sb.append(s)
            case (_, l: Long) => isum += l
            case _ => ()
          }
        }
        Seq[Any](sb.toString, rows.length, nDel, isum)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row .dbf synthesizer (map-only): two rows splitting the
    * text (latin-1-safe by replacing wider chars — the format has
    * no unicode; the oracle applies the same projection), SEQ
    * carrying id-derived integers.
    */
  def synthDbf(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
          .replace('\n', ' ')
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        // fixed-width C fields cap at 254: three chunk rows cover
        // the corpus's longest documents
        val c1 = text.take(254)
        val c2 = text.slice(254, 508)
        val c3 = text.slice(508, 762)
        val bytesOut = dbfWrite(Seq(
          ("p1", c1, id * 5 + 1),
          ("p2", c2, id * 5 + 2),
          ("p3", c3, id * 5 + 3)))
        Row.fromSeq(r.toSeq :+ bytesOut)
      }
    }(enc)
  }
}
