package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** NumPy `.npy` / `.npz` triage (C226) — ML corpora and training
  * lakes are full of serialized arrays: embeddings dumps, label
  * tensors, preprocessing caches. The format is public (numpy's
  * `lib/format.py` docstring, the NEP-1 layout): `\x93NUMPY`,
  * one-byte major/minor version, a little-endian header length
  * (u16 for v1, u32 for v2/3), a Python-dict-literal header with
  * exactly three keys (`descr`, `fortran_order`, `shape`), then raw
  * array bytes.
  *
  * Triage surfaces: format version, dtype descr (simple-string
  * forms; structured/record dtypes REFUSE rather than half-decode),
  * fortran flag, shape, element count, itemsize, and — because the
  * layout is exact, not floating — a data CRC32 plus an exact
  * integer sum for bool/int/uint dtypes (both endiannesses), the
  * fingerprint a dedup pass over array blobs wants.
  *
  * `.npz` is a ZIP of `.npy` members (numpy zips stored by default,
  * deflate for `savez_compressed`) — the walk rides the shared ZIP
  * reader ([[Archive.zipEntries]]).
  *
  * Pinning: NpySpec parses fixtures written by numpy 1.26.4 itself
  * (the reference writer, `tools/npy_pin.py`) and must replay
  * numpy's recorded facts bit-exactly; the minimal writer here
  * round-trips planted values for the per-doc oracle.
  *
  * Totality: None on damage; all bounds checked; no throw escapes.
  * Scale: per-value map-only work — header + one linear pass.
  */
object Npy {

  /** Max header we accept (numpy v1 caps at 65535 anyway; v2/3
    * headers beyond 1 MB are hostile for triage purposes).
    */
  private val MaxHeader = 1 << 20

  final case class NpyMeta(version: String, descr: String,
      fortran: Boolean, shape: Seq[Long], itemSize: Int,
      nElems: Long, dataCrc32: Long, intSum: Option[Long])

  /** dtype descr → (kind char, itemsize, bigEndian). Simple string
    * forms only: `[<>|=]?[biufcSUV]\d+`. Returns None for
    * structured descr or anything malformed.
    */
  private def parseDescr(d: String): Option[(Char, Int, Boolean)] = {
    if (d.isEmpty) return None
    val (order, rest) =
      if ("<>|=".indexOf(d.charAt(0)) >= 0) (d.charAt(0), d.substring(1))
      else ('=', d)
    if (rest.isEmpty) return None
    val kind = rest.charAt(0)
    if ("biufcSUV".indexOf(kind) < 0) return None
    val num = rest.substring(1)
    if (num.isEmpty || !num.forall(_.isDigit) || num.length > 7)
      return None
    val n = num.toInt
    val item = if (kind == 'U') n * 4 else n
    if (item <= 0 || item > MaxHeader) return None
    Some((kind, item, order == '>'))
  }

  /** Parse the header dict literal. numpy writes it with repr(), so
    * the grammar is narrow: single-quoted keys, `True`/`False`,
    * an int tuple (with the 1-tuple trailing comma), and either a
    * quoted descr string or a structured list (→ refuse). A strict
    * scanner is safer than anything eval-like on untrusted bytes.
    */
  private def parseHeader(h: String)
      : Option[(String, Boolean, Seq[Long])] = {
    var descr: String = null
    var fortran: Option[Boolean] = None
    var shape: Seq[Long] = null
    val s = h.trim
    if (!s.startsWith("{") || !s.endsWith("}")) return None
    var p = 1
    val end = s.length - 1
    def skipWs(): Unit = { while (p < end && s.charAt(p) == ' ') p += 1 }
    def quoted(): Option[String] = {
      if (p >= end || s.charAt(p) != '\'') return None
      val close = s.indexOf('\'', p + 1)
      if (close < 0 || close >= end) return None
      val v = s.substring(p + 1, close)
      p = close + 1
      Some(v)
    }
    var guard = 0
    skipWs()
    while (p < end && guard < 16) {
      guard += 1
      val key = quoted().getOrElse(return None)
      skipWs()
      if (p >= end || s.charAt(p) != ':') return None
      p += 1
      skipWs()
      key match {
        case "descr" =>
          if (p < end && s.charAt(p) == '\'')
            descr = quoted().getOrElse(return None)
          else return None // structured ([...]) or malformed
        case "fortran_order" =>
          if (s.startsWith("True", p)) { fortran = Some(true); p += 4 }
          else if (s.startsWith("False", p)) {
            fortran = Some(false); p += 5
          } else return None
        case "shape" =>
          if (p >= end || s.charAt(p) != '(') return None
          p += 1
          val dims = Seq.newBuilder[Long]
          var closed = false
          var dguard = 0
          while (!closed && dguard < 64) {
            dguard += 1
            skipWs()
            if (p < end && s.charAt(p) == ')') { closed = true; p += 1 }
            else {
              val d0 = p
              while (p < end && s.charAt(p).isDigit) p += 1
              if (p == d0 || p - d0 > 15) return None
              dims += s.substring(d0, p).toLong
              skipWs()
              if (p < end && s.charAt(p) == ',') p += 1
              else if (p < end && s.charAt(p) == ')') ()
              else return None
            }
          }
          if (!closed) return None
          shape = dims.result()
        case _ => return None
      }
      skipWs()
      if (p < end && s.charAt(p) == ',') p += 1
      skipWs()
    }
    if (p < end) return None // trailing garbage after 16 keys
    if (descr == null || fortran.isEmpty || shape == null) None
    else Some((descr, fortran.get, shape))
  }

  /** Parse one `.npy` blob. None on damage, structured dtypes, or
    * a data section that disagrees with shape × itemsize.
    */
  def npyMeta(b: Array[Byte]): Option[NpyMeta] = {
    if (b == null || b.length < 12) return None
    if ((b(0) & 0xff) != 0x93 || b(1) != 'N' || b(2) != 'U' ||
        b(3) != 'M' || b(4) != 'P' || b(5) != 'Y') return None
    val major = b(6) & 0xff
    val minor = b(7) & 0xff
    if (major < 1 || major > 3) return None
    val (hlen, hAt) =
      if (major == 1) ((b(8) & 0xff) | ((b(9) & 0xff) << 8), 10)
      else {
        if (b.length < 13) return None
        val l = (b(8) & 0xff) | ((b(9) & 0xff) << 8) |
          ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24)
        (l, 12)
      }
    if (hlen <= 0 || hlen > MaxHeader || hAt + hlen > b.length)
      return None
    // v1/2 headers are latin-1, v3 utf-8; both decode the ASCII
    // dict grammar identically, and non-ASCII only ever appears in
    // structured field names, which refuse anyway
    val header = new String(b, hAt, hlen,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val (descr, fortran, shape) =
      parseHeader(header).getOrElse(return None)
    val (kind, itemSize, big) =
      parseDescr(descr).getOrElse(return None)
    var nElems = 1L
    shape.foreach { d =>
      if (d < 0) return None
      if (d == 0) nElems = 0
      else if (nElems > Long.MaxValue / d) return None
      else nElems *= d
    }
    val dataAt = hAt + hlen
    val dataLen = b.length - dataAt
    if (nElems > Int.MaxValue || nElems * itemSize != dataLen)
      return None
    val crc = new java.util.zip.CRC32()
    crc.update(b, dataAt, dataLen)
    val intSum: Option[Long] =
      if (kind != 'b' && kind != 'i' && kind != 'u') None
      else {
        var sum = 0L
        var i = 0
        val n = nElems.toInt
        while (i < n) {
          val o = dataAt + i * itemSize
          var v = 0L
          if (kind == 'b') v = if (b(o) != 0) 1L else 0L
          else {
            // assemble little- or big-endian, sign-extend for 'i'
            var j = 0
            while (j < itemSize) {
              val byteAt = if (big) o + itemSize - 1 - j else o + j
              v |= (b(byteAt) & 0xffL) << (8 * j)
              j += 1
            }
            if (kind == 'i' && itemSize < 8) {
              val shift = 64 - 8 * itemSize
              v = (v << shift) >> shift
            }
          }
          sum += v
          i += 1
        }
        Some(sum)
      }
    Some(NpyMeta(s"$major.$minor", descr, fortran, shape, itemSize,
      nElems, crc.getValue, intSum))
  }

  /** One `.npz` member: name (with the `.npy` suffix numpy appends)
    * and its parsed meta; a member that fails extraction or parse
    * carries None.
    */
  def npzEntries(b: Array[Byte])
      : Option[Seq[(String, Option[NpyMeta])]] =
    Archive.zipEntries(b).map { es =>
      es.map { e =>
        val meta = Archive.zipExtract(b, e).flatMap(npyMeta)
        (e.name, meta)
      }
    }

  // ---------------------------------------------------------------
  // writer (fixture/synth): v1 by default, v2 on demand — exactly
  // numpy's layout including the 64-byte alignment padding
  // ---------------------------------------------------------------

  def npyWrite(descr: String, fortran: Boolean, shape: Seq[Long],
      data: Array[Byte], v2: Boolean = false): Array[Byte] = {
    val shapeStr = shape.length match {
      case 0 => "()"
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': $shapeStr, }"
    val preLen = (if (v2) 12 else 10) + dict.length + 1 // + \n
    val pad = (64 - preLen % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93)
    out.write("NUMPY".getBytes("US-ASCII"))
    out.write(if (v2) 2 else 1)
    out.write(0)
    val hl = header.length
    out.write(hl & 0xff); out.write((hl >> 8) & 0xff)
    if (v2) { out.write((hl >> 16) & 0xff); out.write((hl >> 24) & 0xff) }
    out.write(header.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(data)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val npySchema: StructType = StructType(Seq(
    StructField("npy_version", StringType),
    StructField("descr", StringType),
    StructField("fortran", BooleanType),
    StructField("ndim", IntegerType),
    StructField("shape", StringType),
    StructField("n_elems", LongType),
    StructField("item_size", IntegerType),
    StructField("int_sum", LongType)))

  def decodeNpy(bytes: Array[Byte]): Seq[Any] =
    npyMeta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.descr, m.fortran,
        m.shape.length, m.shape.mkString("x"), m.nElems, m.itemSize,
        m.intSum.map(java.lang.Long.valueOf).orNull)
      case None => Seq[Any](null, null, null, null, null, null,
        null, null)
    }

  private def le(v: Long, w: Int, out: java.io.ByteArrayOutputStream)
      : Unit = {
    var j = 0
    while (j < w) { out.write(((v >> (8 * j)) & 0xff).toInt); j += 1 }
  }

  /** Per-doc synth: six planted array kinds cycling on doc_id, all
    * facts closed-form for the oracle.
    */
  def synthNpys(df: DataFrame, idCol: String, outCol: String)
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
        val k = java.lang.Math.floorMod(id, 6L).toInt
        val out = new java.io.ByteArrayOutputStream()
        val bytes = k match {
          case 0 =>
            val n = (id % 7 + 3).toInt
            (0 until n).foreach(j => le(id + j, 8, out))
            npyWrite("<i8", fortran = false, Seq(n.toLong),
              out.toByteArray)
          case 1 =>
            val m = (id % 5 + 2).toInt
            (0 until 2 * m).foreach { j =>
              le(java.lang.Double.doubleToLongBits(j * 0.5), 8, out)
            }
            npyWrite("<f8", fortran = false, Seq(2L, m.toLong),
              out.toByteArray)
          case 2 =>
            val n = (id % 9 + 4).toInt
            (0 until n).foreach(j => out.write(j % 2))
            npyWrite("|b1", fortran = false, Seq(n.toLong),
              out.toByteArray)
          case 3 =>
            val m = (id % 6 + 2).toInt
            (0 until m).foreach { j =>
              val v = 3L * j + 1
              // big-endian i4
              out.write(((v >> 24) & 0xff).toInt)
              out.write(((v >> 16) & 0xff).toInt)
              out.write(((v >> 8) & 0xff).toInt)
              out.write((v & 0xff).toInt)
            }
            npyWrite(">i4", fortran = false, Seq(m.toLong),
              out.toByteArray, v2 = true)
          case 4 =>
            (0 until 6).foreach(j => le(j + id % 100, 2, out))
            npyWrite("<u2", fortran = true, Seq(2L, 3L),
              out.toByteArray)
          case _ =>
            le(id, 8, out)
            npyWrite("<i8", fortran = false, Seq.empty,
              out.toByteArray)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** Per-doc npz synth: three members (int / float / bool), zipped
    * stored for even docs and deflated for odd — both numpy layouts.
    */
  def synthNpzs(df: DataFrame, idCol: String, outCol: String)
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
        val n = (id % 5 + 2).toInt
        val a = new java.io.ByteArrayOutputStream()
        (0 until n).foreach(j => le(id + 2L * j, 8, a))
        val bo = new java.io.ByteArrayOutputStream()
        (0 until 4).foreach { j =>
          le(java.lang.Float.floatToIntBits(j * 0.25f).toLong, 4, bo)
        }
        val c = new java.io.ByteArrayOutputStream()
        (0 until 3).foreach(j => c.write(if (j == 1) 0 else 1))
        val deflate = id % 2 == 1
        val bytes = Archive.zipWrite(Seq(
          ("a.npy", npyWrite("<i8", fortran = false, Seq(n.toLong),
            a.toByteArray), deflate),
          ("b.npy", npyWrite("<f4", fortran = false, Seq(2L, 2L),
            bo.toByteArray), deflate),
          ("c.npy", npyWrite("|b1", fortran = false, Seq(3L),
            c.toByteArray), deflate)))
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** One row per npz member with its parsed facts. */
  def npzEntryRows(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(Seq(
      df.schema.fields(ii),
      StructField("member", StringType),
      StructField("descr", StringType),
      StructField("shape", StringType),
      StructField("n_elems", LongType),
      StructField("int_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        npzEntries(r.getAs[Array[Byte]](ci)).toSeq.flatten.map {
          case (name, Some(m)) => Row(id, name, m.descr,
            m.shape.mkString("x"), m.nElems,
            m.intSum.map(java.lang.Long.valueOf).orNull)
          case (name, None) => Row(id, name, null, null, null, null)
        }
      }
    }(enc)
  }
}
