package graft.operators

/** Parquet data-page decode, FULL physical-type matrix (round 19) —
  * house code reading VALUES for every flat column a Spark-written
  * table actually contains: BOOLEAN / INT32 / INT64 / FLOAT /
  * DOUBLE / BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY, v1 AND v2 data
  * pages, PLAIN + RLE + dictionary + the three delta encodings
  * (DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY,
  * DELTA_BYTE_ARRAY), with definition levels driven by the footer
  * schema's declared repetition — not assumed (the r18 reader
  * hard-coded REQUIRED for INT64 and OPTIONAL for BYTE_ARRAY; an
  * OPTIONAL INT64 chunk would have been silently misdecoded).
  * This is the gate on the end-to-end lakehouse table read: a flat
  * lineitem projection must decode entirely with house code.
  *
  * Wire format from the public parquet-format spec (Encodings.md,
  * DataPageV2, thrift compact protocol); decimal/UTF8 conversion
  * from LogicalTypes.md. Reference behavior pinned against
  * parquet-mr via Spark-written fixtures (PqTypedSpec reads the
  * same committed bytes with spark.read.parquet and the two must
  * agree value-for-value).
  *
  * Reference surface: pytrousse reads whole tables eagerly via
  * pandas (dataset.py:53); at 100 TB the engine instead decodes
  * each file inside its own map task — per-file, map-only,
  * no driver involvement.
  *
  * Totality: None on damage (truncation, codec lies, unknown
  * encodings, nested/repeated columns). Scale: per-file map work.
  */
object ParquetTyped {
  import ParquetMeta.{Reader, QFail, struct, list, skip, readHybrid}

  // ---------------------------------------------------------------
  // footer schema: leaf repetition + physical/logical type
  // ---------------------------------------------------------------

  /** One top-level leaf column as the footer declares it.
    * `maxDef` is 1 for OPTIONAL, 0 for REQUIRED; REPEATED and
    * nested leaves are refused by [[leafInfo]].
    */
  final case class PqLeaf(name: String, ptype: Int, typeLength: Int,
      repetition: Int, converted: Int, scale: Int, precision: Int,
      fieldId: Int = -1) {
    def maxDef: Int = if (repetition == 1) 1 else 0
    def isUtf8: Boolean = converted == 0
    def isDecimal: Boolean = converted == 5
  }

  private final case class SchemaEl(name: String, ptype: Int,
      typeLength: Int, repetition: Int, numChildren: Int,
      converted: Int, scale: Int, precision: Int, fieldId: Int)

  /** Parse the footer's schema-element list (FileMetaData field 2,
    * pre-order). None on damage.
    */
  private def schemaElements(b: Array[Byte]): Option[Seq[SchemaEl]] = {
    if (b == null || b.length < 12) return None
    def magic(o: Int): Boolean = b(o) == 'P' && b(o + 1) == 'A' &&
      b(o + 2) == 'R' && b(o + 3) == '1'
    if (!magic(0) || !magic(b.length - 4)) return None
    val mdLen = (b(b.length - 8) & 0xff) |
      ((b(b.length - 7) & 0xff) << 8) |
      ((b(b.length - 6) & 0xff) << 16) |
      ((b(b.length - 5) & 0xff) << 24)
    if (mdLen <= 0 || mdLen > b.length - 12) return None
    try {
      val r = new Reader(b, b.length - 8 - mdLen, b.length - 8)
      val els = Seq.newBuilder[SchemaEl]
      struct(r, 0) { (fid, typ) =>
        fid match {
          case 2 if typ == 9 =>
            list(r) { et =>
              if (et != 12) throw QFail()
              var name = ""
              var pt = -1
              var tl = -1
              var rep = -1
              var nc = 0
              var conv = -1
              var sc = 0
              var prec = 0
              var fid = -1
              struct(r, 1) { (sf, st) =>
                sf match {
                  case 1 if st == 5 => pt = r.zigzag().toInt
                  case 2 if st == 5 => tl = r.zigzag().toInt
                  case 3 if st == 5 => rep = r.zigzag().toInt
                  case 4 if st == 8 =>
                    name = new String(r.bytes(r.varint().toInt),
                      java.nio.charset.StandardCharsets.UTF_8)
                  case 5 if st == 5 => nc = r.zigzag().toInt
                  case 6 if st == 5 => conv = r.zigzag().toInt
                  case 7 if st == 5 => sc = r.zigzag().toInt
                  case 8 if st == 5 => prec = r.zigzag().toInt
                  case 9 if st == 5 => fid = r.zigzag().toInt
                  case _ => skip(r, st, 2)
                }
              }
              els += SchemaEl(name, pt, tl, rep, nc, conv, sc,
                prec, fid)
            }
          case _ => skip(r, typ, 1)
        }
      }
      val out = els.result()
      if (out.isEmpty) None else Some(out)
    } catch {
      case _: QFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** The declared shape of a TOP-LEVEL leaf column. None when the
    * path does not name a flat leaf of the root (nested structs,
    * lists, repeated fields all refuse — this reader's scope is
    * flat columns, stated rather than assumed).
    */
  def leafInfo(b: Array[Byte], path: String): Option[PqLeaf] = {
    val els = schemaElements(b).getOrElse(return None)
    val root = els.head
    // walk the pre-order list consuming subtrees; only depth-1
    // elements are candidates
    var i = 1
    var remaining = root.numChildren
    def subtreeSize(at: Int): Int = {
      var size = 1
      var kids = els(at).numChildren
      var j = at + 1
      while (kids > 0) {
        if (j >= els.length) throw QFail()
        val s = subtreeSize(j)
        size += s
        j += s
        kids -= 1
      }
      size
    }
    try {
      while (remaining > 0 && i < els.length) {
        val e = els(i)
        if (e.name == path) {
          return if (e.numChildren == 0 && e.repetition != 2 &&
            e.ptype >= 0)
            Some(PqLeaf(e.name, e.ptype, e.typeLength, e.repetition,
              e.converted, e.scale, e.precision, e.fieldId))
          else None
        }
        i += subtreeSize(i)
        remaining -= 1
      }
      None
    } catch { case _: QFail => None }
  }

  /** The NAME of the top-level leaf whose parquet field_id is
    * `fid` — the resolution step of Delta's id-mode column mapping
    * (a reader must find columns by id, not name, when
    * delta.columnMapping.mode = "id"). None when absent.
    */
  def leafNameByFieldId(b: Array[Byte], fid: Int): Option[String] = {
    val els = schemaElements(b).getOrElse(return None)
    def subtreeSize(at: Int): Int = {
      var size = 1
      var kids = els(at).numChildren
      var j = at + 1
      while (kids > 0) {
        if (j >= els.length) throw QFail()
        val s = subtreeSize(j)
        size += s
        j += s
        kids -= 1
      }
      size
    }
    try {
      var i = 1
      var remaining = els.head.numChildren
      while (remaining > 0 && i < els.length) {
        val e = els(i)
        if (e.fieldId == fid && e.numChildren == 0)
          return Some(e.name)
        i += subtreeSize(i) // flat-only resolution, like leafInfo
        remaining -= 1
      }
      None
    } catch {
      case _: QFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // footer row groups: every chunk of a named column, in order
  // ---------------------------------------------------------------

  private final case class ChunkAt(codec: Int, nVals: Long,
      firstOff: Long)

  private def chunksFor(b: Array[Byte], wantPath: String)
      : Option[Seq[ChunkAt]] = {
    if (b == null || b.length < 12) return None
    val mdLen = (b(b.length - 8) & 0xff) |
      ((b(b.length - 7) & 0xff) << 8) |
      ((b(b.length - 6) & 0xff) << 16) |
      ((b(b.length - 5) & 0xff) << 24)
    if (mdLen <= 0 || mdLen > b.length - 12) return None
    try {
      val r = new Reader(b, b.length - 8 - mdLen, b.length - 8)
      val found = Seq.newBuilder[ChunkAt]
      struct(r, 0) { (fid, typ) =>
        fid match {
          case 4 if typ == 9 =>
            list(r) { et =>
              if (et != 12) throw QFail()
              struct(r, 1) { (rf, rt) =>
                rf match {
                  case 1 if rt == 9 =>
                    list(r) { ct =>
                      if (ct != 12) throw QFail()
                      var path = ""
                      var codec = -1
                      var nVals = -1L
                      var dataOff = -1L
                      var dictOff = -1L
                      struct(r, 2) { (cf, cty) =>
                        cf match {
                          case 3 if cty == 12 =>
                            struct(r, 3) { (mf, mt) =>
                              mf match {
                                case 3 if mt == 9 =>
                                  val parts = Seq.newBuilder[String]
                                  list(r) { pt =>
                                    if (pt != 8) throw QFail()
                                    parts += new String(
                                      r.bytes(r.varint().toInt),
                                      java.nio.charset
                                        .StandardCharsets.UTF_8)
                                  }
                                  path = parts.result().mkString(".")
                                case 4 if mt == 5 =>
                                  codec = r.zigzag().toInt
                                case 5 if mt == 6 =>
                                  nVals = r.zigzag()
                                case 9 if mt == 6 =>
                                  dataOff = r.zigzag()
                                case 11 if mt == 6 =>
                                  dictOff = r.zigzag()
                                case _ => skip(r, mt, 4)
                              }
                            }
                          case _ => skip(r, cty, 3)
                        }
                      }
                      if (path == wantPath && codec >= 0 &&
                        nVals >= 0 && dataOff >= 0) {
                        val first = if (dictOff >= 0 &&
                          dictOff < dataOff) dictOff else dataOff
                        found += ChunkAt(codec, nVals, first)
                      }
                    }
                  case _ => skip(r, rt, 2)
                }
              }
            }
          case _ => skip(r, typ, 1)
        }
      }
      val out = found.result()
      if (out.isEmpty) None else Some(out)
    } catch {
      case _: QFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // codecs (same set the r18 INT64 reader spoke)
  // ---------------------------------------------------------------

  private def inflate(codec: Int, raw: Array[Byte], uncomp: Int)
      : Array[Byte] = {
    def be32(a: Array[Byte], o: Int): Int =
      ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) |
        ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
    val data = codec match {
      case 0 => raw
      case 1 => Snappy.decompress(raw, uncomp + 8)
        .getOrElse(throw QFail())
      case 2 =>
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw))
          try in.readAllBytes() finally in.close()
        } catch { case _: java.io.IOException => throw QFail() }
      case 5 => // Hadoop-framed LZ4
        val o = new java.io.ByteArrayOutputStream()
        var q = 0
        while (q < raw.length) {
          if (q + 8 > raw.length) throw QFail()
          val ul = be32(raw, q)
          val cl = be32(raw, q + 4)
          if (ul < 0 || cl <= 0 || q + 8 + cl > raw.length)
            throw QFail()
          val blk = Lz4.decodeRawBlock(raw, q + 8, q + 8 + cl, ul)
            .getOrElse(throw QFail())
          if (blk.length != ul) throw QFail()
          o.write(blk, 0, blk.length)
          q += 8 + cl
        }
        o.toByteArray
      case 6 => Zstd.decompress(raw).getOrElse(throw QFail())
      case 7 => Lz4.decodeRawBlock(raw, 0, raw.length, uncomp)
        .getOrElse(throw QFail())
      case _ => throw QFail()
    }
    if (data.length != uncomp) throw QFail()
    data
  }

  // ---------------------------------------------------------------
  // bit-packed little-endian value unpacking (delta miniblocks)
  // ---------------------------------------------------------------

  /** Value `idx` of width `w` bits, LSB-first packing starting at
    * byte `base` of `data`.
    */
  private def bitsAt(data: Array[Byte], base: Int, idx: Int, w: Int)
      : Long = {
    var v = 0L
    var i = 0
    val start = idx.toLong * w
    while (i < w) {
      val bp = start + i
      val by = base + (bp >> 3).toInt
      if (by >= data.length) throw QFail()
      v |= (((data(by) >> (bp & 7).toInt) & 1).toLong) << i
      i += 1
    }
    v
  }

  /** DELTA_BINARY_PACKED (Encodings.md §Delta Encoding): header
    * [block size][miniblocks per block][total count][first value],
    * then per block [min delta][miniblock bit widths][packed
    * deltas]. parquet-mr writes data only for miniblocks that
    * contain values; the decoder stops with it. Stateful over
    * `pos` so the byte-array encodings can read what follows.
    */
  private final class DeltaReader(data: Array[Byte], var pos: Int) {
    private def u8(): Int = {
      if (pos >= data.length) throw QFail()
      val v = data(pos) & 0xff
      pos += 1
      v
    }
    private def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw QFail()
    }
    private def zigzag(): Long = {
      val v = varint()
      (v >>> 1) ^ -(v & 1)
    }
    def read(): Array[Long] = {
      val blockSize = varint().toInt
      val miniPer = varint().toInt
      val total = varint().toInt
      if (blockSize <= 0 || blockSize % 128 != 0 || miniPer <= 0 ||
        blockSize % miniPer != 0 || total < 0 || total > (1 << 28))
        throw QFail()
      val perMini = blockSize / miniPer
      if (perMini % 8 != 0) throw QFail()
      val out = new Array[Long](total)
      if (total == 0) { zigzag(); return out }
      out(0) = zigzag()
      var got = 1
      while (got < total) {
        val minDelta = zigzag()
        val widths = new Array[Int](miniPer)
        var k = 0
        while (k < miniPer) { widths(k) = u8(); k += 1 }
        var mb = 0
        while (mb < miniPer && got < total) {
          val w = widths(mb)
          if (w > 64) throw QFail()
          val nbytes = perMini * w / 8
          if (pos + nbytes > data.length) throw QFail()
          var i = 0
          while (i < perMini && got < total) {
            val d = if (w == 0) 0L else bitsAt(data, pos, i, w)
            out(got) = out(got - 1) + minDelta + d
            got += 1
            i += 1
          }
          pos += nbytes
          mb += 1
        }
      }
      out
    }
  }

  // ---------------------------------------------------------------
  // per-page value decoding (raw, pre-conversion)
  // ---------------------------------------------------------------

  private def le32(a: Array[Byte], o: Int): Int = {
    if (o + 4 > a.length) throw QFail()
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
      ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
  }
  private def le64(a: Array[Byte], o: Int): Long = {
    if (o + 8 > a.length) throw QFail()
    var v = 0L
    var j = 0
    while (j < 8) { v |= (a(o + j) & 0xffL) << (8 * j); j += 1 }
    v
  }

  /** PLAIN decode of `n` values of `ptype` at `pos`; returns the
    * boxed raw values and the position after them.
    */
  private def plain(data: Array[Byte], pos0: Int, n: Int,
      leaf: PqLeaf): (Array[AnyRef], Int) = {
    val out = new Array[AnyRef](n)
    var pos = pos0
    leaf.ptype match {
      case 0 => // BOOLEAN: bit-packed LSB-first
        var i = 0
        while (i < n) {
          val by = pos + (i >> 3)
          if (by >= data.length) throw QFail()
          out(i) = java.lang.Boolean.valueOf(
            ((data(by) >> (i & 7)) & 1) == 1)
          i += 1
        }
        pos += (n + 7) / 8
      case 1 =>
        var i = 0
        while (i < n) {
          out(i) = java.lang.Integer.valueOf(le32(data, pos))
          pos += 4
          i += 1
        }
      case 2 =>
        var i = 0
        while (i < n) {
          out(i) = java.lang.Long.valueOf(le64(data, pos))
          pos += 8
          i += 1
        }
      case 4 =>
        var i = 0
        while (i < n) {
          out(i) = java.lang.Float.valueOf(
            java.lang.Float.intBitsToFloat(le32(data, pos)))
          pos += 4
          i += 1
        }
      case 5 =>
        var i = 0
        while (i < n) {
          out(i) = java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(le64(data, pos)))
          pos += 8
          i += 1
        }
      case 6 =>
        var i = 0
        while (i < n) {
          val len = le32(data, pos)
          if (len < 0 || pos + 4 + len > data.length) throw QFail()
          out(i) = java.util.Arrays.copyOfRange(data, pos + 4,
            pos + 4 + len)
          pos += 4 + len
          i += 1
        }
      case 7 =>
        val tl = leaf.typeLength
        if (tl <= 0) throw QFail()
        var i = 0
        while (i < n) {
          if (pos + tl > data.length) throw QFail()
          out(i) = java.util.Arrays.copyOfRange(data, pos, pos + tl)
          pos += tl
          i += 1
        }
      case _ => throw QFail() // INT96 and friends: out of scope
    }
    (out, pos)
  }

  /** Decode `nDef` DEFINED values starting at `pos` with `enc`. */
  private def decodeValues(data: Array[Byte], pos: Int, nDef: Int,
      enc: Int, leaf: PqLeaf, dict: Array[AnyRef])
      : Array[AnyRef] = {
    enc match {
      case 0 => plain(data, pos, nDef, leaf)._1
      case 2 | 8 => // dictionary indices
        if (dict == null || pos >= data.length) throw QFail()
        val bw = data(pos) & 0xff
        if (bw > 32) throw QFail()
        val idxs =
          if (bw == 0) new Array[Int](nDef)
          else readHybrid(data, pos + 1, data.length, bw, nDef)
        val out = new Array[AnyRef](nDef)
        var i = 0
        while (i < nDef) {
          val ix = idxs(i)
          if (ix < 0 || ix >= dict.length) throw QFail()
          out(i) = dict(ix)
          i += 1
        }
        out
      case 3 => // RLE-as-values: booleans, 4-byte length prefix
        if (leaf.ptype != 0) throw QFail()
        val len = le32(data, pos)
        if (len < 0 || pos + 4 + len > data.length) throw QFail()
        val bits = readHybrid(data, pos + 4, pos + 4 + len, 1, nDef)
        val out = new Array[AnyRef](nDef)
        var i = 0
        while (i < nDef) {
          out(i) = java.lang.Boolean.valueOf(bits(i) == 1)
          i += 1
        }
        out
      case 5 => // DELTA_BINARY_PACKED: int32 / int64
        if (leaf.ptype != 1 && leaf.ptype != 2) throw QFail()
        val longs = new DeltaReader(data, pos).read()
        if (longs.length < nDef) throw QFail()
        val out = new Array[AnyRef](nDef)
        var i = 0
        while (i < nDef) {
          out(i) =
            if (leaf.ptype == 1)
              java.lang.Integer.valueOf(longs(i).toInt)
            else java.lang.Long.valueOf(longs(i))
          i += 1
        }
        out
      case 6 => // DELTA_LENGTH_BYTE_ARRAY
        if (leaf.ptype != 6) throw QFail()
        val dr = new DeltaReader(data, pos)
        val lens = dr.read()
        if (lens.length < nDef) throw QFail()
        val out = new Array[AnyRef](nDef)
        var q = dr.pos
        var i = 0
        while (i < nDef) {
          val len = lens(i).toInt
          if (len < 0 || q + len > data.length) throw QFail()
          out(i) = java.util.Arrays.copyOfRange(data, q, q + len)
          q += len
          i += 1
        }
        out
      case 7 => // DELTA_BYTE_ARRAY: prefix lengths + suffixes
        if (leaf.ptype != 6 && leaf.ptype != 7) throw QFail()
        val pr = new DeltaReader(data, pos)
        val prefixes = pr.read()
        val sr = new DeltaReader(data, pr.pos)
        val sufLens = sr.read()
        if (prefixes.length < nDef || sufLens.length < nDef)
          throw QFail()
        val out = new Array[AnyRef](nDef)
        var q = sr.pos
        var prev = new Array[Byte](0)
        var i = 0
        while (i < nDef) {
          val pl = prefixes(i).toInt
          val sl = sufLens(i).toInt
          if (pl < 0 || sl < 0 || pl > prev.length ||
            q + sl > data.length) throw QFail()
          val v = new Array[Byte](pl + sl)
          System.arraycopy(prev, 0, v, 0, pl)
          System.arraycopy(data, q, v, pl, sl)
          out(i) = v
          prev = v
          q += sl
          i += 1
        }
        out
      case _ => throw QFail()
    }
  }

  // ---------------------------------------------------------------
  // the chunk walk
  // ---------------------------------------------------------------

  /** A fully decoded flat column: converted values (null entries
    * for nulls), plus the decode census the specs pin.
    */
  final case class PqTyped(ptypeName: String, values: Array[AnyRef],
      nNulls: Int, nDictEntries: Int, nDataPages: Int,
      nV2Pages: Int)

  private val PtypeNames = Map(0 -> "boolean", 1 -> "int32",
    2 -> "int64", 4 -> "float", 5 -> "double", 6 -> "byte_array",
    7 -> "fixed_len_byte_array")

  /** Logical conversion applied once post-decode: UTF8 byte arrays
    * → String; DECIMAL int32/int64/FLBA → java.math.BigDecimal at
    * the declared scale. Dates/timestamps stay as their raw
    * int32-days / int64-micros representation (the caller picks
    * the rendering; the arithmetic is already exact).
    */
  private def convert(v: AnyRef, leaf: PqLeaf): AnyRef = {
    if (v == null) return null
    if (leaf.isDecimal) leaf.ptype match {
      case 1 => java.math.BigDecimal.valueOf(
        v.asInstanceOf[java.lang.Integer].longValue(), leaf.scale)
      case 2 => java.math.BigDecimal.valueOf(
        v.asInstanceOf[java.lang.Long].longValue(), leaf.scale)
      case 7 | 6 => new java.math.BigDecimal(
        new java.math.BigInteger(v.asInstanceOf[Array[Byte]]),
        leaf.scale)
      case _ => throw QFail()
    }
    else if (leaf.ptype == 6 && leaf.isUtf8)
      new String(v.asInstanceOf[Array[Byte]],
        java.nio.charset.StandardCharsets.UTF_8)
    else v
  }

  /** Decode EVERY value of a named flat column across all row
    * groups. None on refusal — wrong repetition assumptions are
    * impossible by construction: the footer schema drives them.
    */
  def readTypedColumn(b: Array[Byte], path: String)
      : Option[PqTyped] = {
    val leaf = leafInfo(b, path).getOrElse(return None)
    val chunks = chunksFor(b, path).getOrElse(return None)
    try {
      val all = Array.newBuilder[AnyRef]
      var nNulls = 0
      var nDictEntries = 0
      var nDataPages = 0
      var nV2 = 0
      chunks.foreach { ch =>
        var dict: Array[AnyRef] = null
        var got = 0L
        var p = ch.firstOff.toInt
        while (got < ch.nVals) {
          val r = new Reader(b, p, b.length)
          var pType = -1
          var uncomp = -1
          var comp = -1
          var numV = -1
          var enc = -1
          var numNulls = -1
          var defLen2 = -1
          var repLen2 = -1
          var v2Compressed = true
          struct(r, 0) { (fid, typ) =>
            fid match {
              case 1 if typ == 5 => pType = r.zigzag().toInt
              case 2 if typ == 5 => uncomp = r.zigzag().toInt
              case 3 if typ == 5 => comp = r.zigzag().toInt
              case 5 if typ == 12 => // data_page_header (v1)
                struct(r, 1) { (df, dt) =>
                  df match {
                    case 1 if dt == 5 => numV = r.zigzag().toInt
                    case 2 if dt == 5 => enc = r.zigzag().toInt
                    case _ => skip(r, dt, 2)
                  }
                }
              case 7 if typ == 12 => // dictionary_page_header
                struct(r, 1) { (df, dt) =>
                  df match {
                    case 1 if dt == 5 => numV = r.zigzag().toInt
                    case 2 if dt == 5 => enc = r.zigzag().toInt
                    case _ => skip(r, dt, 2)
                  }
                }
              case 8 if typ == 12 => // data_page_header_v2
                struct(r, 1) { (df, dt) =>
                  df match {
                    case 1 if dt == 5 => numV = r.zigzag().toInt
                    case 2 if dt == 5 => numNulls = r.zigzag().toInt
                    case 3 if dt == 5 => r.zigzag() // num_rows
                    case 4 if dt == 5 => enc = r.zigzag().toInt
                    case 5 if dt == 5 => defLen2 = r.zigzag().toInt
                    case 6 if dt == 5 => repLen2 = r.zigzag().toInt
                    case 7 if dt == 1 || dt == 2 =>
                      v2Compressed = dt == 1
                    case _ => skip(r, dt, 2)
                  }
                }
              case _ => skip(r, typ, 1)
            }
          }
          if (comp < 0 || uncomp < 0 || numV < 0) throw QFail()
          val payloadAt = r.p
          if (payloadAt + comp > b.length) throw QFail()
          pType match {
            case 2 => // dictionary page: PLAIN of the column type
              if (enc != 0 && enc != 2) throw QFail()
              val raw = java.util.Arrays.copyOfRange(b, payloadAt,
                payloadAt + comp)
              val data = inflate(ch.codec, raw, uncomp)
              dict = plain(data, 0, numV, leaf)._1
              nDictEntries = dict.length
            case 0 => // data page v1
              nDataPages += 1
              val raw = java.util.Arrays.copyOfRange(b, payloadAt,
                payloadAt + comp)
              val data = inflate(ch.codec, raw, uncomp)
              var pos = 0
              val defs =
                if (leaf.maxDef == 1) {
                  val dl = le32(data, 0)
                  if (dl < 0 || 4 + dl > data.length) throw QFail()
                  pos = 4 + dl
                  readHybrid(data, 4, 4 + dl, 1, numV)
                } else null
              val nDef =
                if (defs == null) numV else defs.count(_ == 1)
              val defined = decodeValues(data, pos, nDef, enc,
                leaf, dict)
              if (defs == null) {
                var i = 0
                while (i < numV) { all += defined(i); i += 1 }
              } else {
                var di = 0
                var i = 0
                while (i < numV) {
                  if (defs(i) == 1) { all += defined(di); di += 1 }
                  else { all += null; nNulls += 1 }
                  i += 1
                }
              }
              got += numV
            case 3 => // data page v2: levels uncompressed up front
              nDataPages += 1
              nV2 += 1
              if (defLen2 < 0 || repLen2 < 0 || numNulls < 0)
                throw QFail()
              if (repLen2 != 0) throw QFail() // flat: no rep levels
              if (payloadAt + repLen2 + defLen2 > b.length)
                throw QFail()
              val defs =
                if (leaf.maxDef == 1 && defLen2 > 0)
                  readHybrid(b, payloadAt + repLen2,
                    payloadAt + repLen2 + defLen2, 1, numV)
                else null
              val nDef = numV - numNulls
              if (defs != null && defs.count(_ == 1) != nDef)
                throw QFail()
              if (defs == null && numNulls != 0) throw QFail()
              val valuesRaw = java.util.Arrays.copyOfRange(b,
                payloadAt + repLen2 + defLen2, payloadAt + comp)
              val data =
                if (v2Compressed)
                  inflate(ch.codec, valuesRaw,
                    uncomp - repLen2 - defLen2)
                else valuesRaw
              val defined = decodeValues(data, 0, nDef, enc, leaf,
                dict)
              if (defs == null) {
                var i = 0
                while (i < numV) { all += defined(i); i += 1 }
              } else {
                var di = 0
                var i = 0
                while (i < numV) {
                  if (defs(i) == 1) { all += defined(di); di += 1 }
                  else { all += null; nNulls += 1 }
                  i += 1
                }
              }
              got += numV
            case _ => throw QFail()
          }
          p = payloadAt + comp
        }
        if (got != ch.nVals) throw QFail()
      }
      val raw = all.result()
      val out = new Array[AnyRef](raw.length)
      var i = 0
      while (i < raw.length) {
        out(i) = convert(raw(i), leaf)
        i += 1
      }
      Some(PqTyped(PtypeNames.getOrElse(leaf.ptype, "?"), out,
        nNulls, nDictEntries, nDataPages, nV2))
    } catch {
      case _: QFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: ClassCastException => None
    }
  }

  // ---------------------------------------------------------------
  // Spark plumbing: the typed-matrix census query
  // ---------------------------------------------------------------

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/parquet/fx$i.parquet")
    try in.readAllBytes() finally in.close()
  }
  /** v1 pages + dictionary + snappy. */
  lazy val FixtureV1Dict: Array[Byte] = fixture(8)
  /** v2 pages + delta encodings (no dictionary) + zstd. */
  lazy val FixtureV2Delta: Array[Byte] = fixture(9)
  /** v1 pages + PLAIN (no dictionary) + uncompressed. */
  lazy val FixtureV1Plain: Array[Byte] = fixture(10)

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  val typedReadSchema: StructType = StructType(Seq(
    StructField("a_i32", IntegerType),
    StructField("a_i32n", IntegerType),
    StructField("a_d", DoubleType),
    StructField("a_f", DoubleType),
    StructField("a_bl", BooleanType),
    StructField("a_sn", StringType),
    StructField("a_dec9", StringType),
    StructField("a_dt_days", IntegerType),
    StructField("a_ts_micros", LongType),
    StructField("b_i32", IntegerType),
    StructField("b_s", StringType),
    StructField("b_dec25", StringType),
    StructField("b_bln", BooleanType),
    StructField("b_fn", DoubleType),
    StructField("c_i32", IntegerType),
    StructField("c_d", DoubleType),
    StructField("c_s", StringType),
    StructField("c_dec18", StringType),
    StructField("n_nulls_i32n", IntegerType),
    StructField("sum_i32", LongType),
    StructField("all3_agree", BooleanType)))

  /** One row per doc: LIVE per-doc probes at doc_id % 3000 into
    * all three typed fixtures — the same planted value read back
    * through v1+dictionary, v2+delta and v1+PLAIN wire paths must
    * replay closed-form, so a misdecode in any (type, encoding,
    * page-version) cell breaks the oracle hash. Fixtures decode
    * ONCE per partition; probes are O(1) lookups.
    */
  def typedReadRows(df: DataFrame, idCol: String): DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields(ii) +:
      typedReadSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      def dec(b: Array[Byte], c: String): Array[AnyRef] =
        readTypedColumn(b, c).map(_.values).orNull
      val a = FixtureV1Dict
      val bx = FixtureV2Delta
      val cx = FixtureV1Plain
      val aCols = Seq("i32", "i32n", "d", "f", "bl", "sn", "dec9",
        "dt", "ts").map(c => c -> dec(a, c)).toMap
      val bCols = Seq("i32", "s", "dec25", "bln", "fn")
        .map(c => c -> dec(bx, c)).toMap
      val cCols = Seq("i32", "d", "s", "dec18")
        .map(c => c -> dec(cx, c)).toMap
      val i32nNulls = readTypedColumn(a, "i32n").map(_.nNulls)
      val sumI32 = Option(bCols("i32")).map(_.foldLeft(0L) {
        (s, v) => s + v.asInstanceOf[java.lang.Integer].intValue()
      })
      val ok = !(aCols.values.exists(_ == null) ||
        bCols.values.exists(_ == null) ||
        cCols.values.exists(_ == null)) &&
        i32nNulls.isDefined && sumI32.isDefined
      it.map { r =>
        if (!ok) Row.fromSeq(r.get(ii) +:
          Seq.fill[Any](typedReadSchema.length)(null))
        else {
          val id = r.get(ii) match {
            case l: java.lang.Long => l.longValue()
            case x => x.hashCode().toLong
          }
          val p = java.lang.Math.floorMod(id, 3000L).toInt
          def str(v: AnyRef): String = v match {
            case null => null
            case d: java.math.BigDecimal => d.toPlainString
            case s: String => s
            case _ => null
          }
          def dbl(v: AnyRef): Any = v match {
            case null => null
            case f: java.lang.Float => f.doubleValue()
            case d: java.lang.Double => d.doubleValue()
            case _ => null
          }
          val agree =
            aCols("i32")(p) == bCols("i32")(p) &&
            bCols("i32")(p) == cCols("i32")(p) &&
            str(bCols("s")(p)) == str(cCols("s")(p)) &&
            dbl(aCols("d")(p)) == dbl(cCols("d")(p))
          Row.fromSeq(Seq[Any](r.get(ii),
            aCols("i32")(p), aCols("i32n")(p), dbl(aCols("d")(p)),
            dbl(aCols("f")(p)), aCols("bl")(p), str(aCols("sn")(p)),
            str(aCols("dec9")(p)), aCols("dt")(p), aCols("ts")(p),
            bCols("i32")(p), str(bCols("s")(p)),
            str(bCols("dec25")(p)), bCols("bln")(p),
            dbl(bCols("fn")(p)),
            cCols("i32")(p), dbl(cCols("d")(p)),
            str(cCols("s")(p)), str(cCols("dec18")(p)),
            i32nNulls.get, sumI32.get, agree))
        }
      }
    }(enc)
  }
}
