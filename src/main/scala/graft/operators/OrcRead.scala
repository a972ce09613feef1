package graft.operators

/** ORC stripe DATA decode (round 19) — reading VALUES from ORC
  * stripes with house code, the read-path parity the metadata tier
  * (footer/stripe stats C228/C249, row-group blooms C261) lacked:
  * present streams (boolean byte-RLE), integer RLEv1 and RLEv2
  * (short-repeat, direct, patched-base, delta), string DIRECT_V2
  * and DICTIONARY_V2, float/double IEEE streams — per the public
  * ORC v1 specification (§Run Length Encoding, §Stripes,
  * §Compression). Spark's own ORC writer is the reference: the
  * committed fixtures cross-check value-for-value against a live
  * `spark.read.orc` of the same bytes (OrcReadSpec), the same pin
  * pattern as C228.
  *
  * Totality: None on damage (truncation, codec lies, unknown
  * encodings, nested columns). Scale: per-file, map-only — each
  * scan task decodes its own stripes; nothing touches the driver.
  */
object OrcRead {
  import Orc.{Reader, OFail, fields, inflateRegion}

  // ---------------------------------------------------------------
  // integer RLE v1 / v2, byte-RLE, booleans (spec §RLEv1/§RLEv2)
  // ---------------------------------------------------------------

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** The 5-bit width-code table (1..24, 26, 28, 30, 32, 40, 48,
    * 56, 64).
    */
  private def widthOf(code: Int): Int =
    if (code < 0) throw OFail()
    else if (code < 24) code + 1
    else code match {
      case 24 => 26
      case 25 => 28
      case 26 => 30
      case 27 => 32
      case 28 => 40
      case 29 => 48
      case 30 => 56
      case 31 => 64
      case _ => throw OFail()
    }

  /** Round a bit count UP to the nearest encodable width. */
  private def closestWidth(bits: Int): Int =
    if (bits <= 24) math.max(1, bits)
    else if (bits <= 26) 26
    else if (bits <= 28) 28
    else if (bits <= 30) 30
    else if (bits <= 32) 32
    else if (bits <= 40) 40
    else if (bits <= 48) 48
    else if (bits <= 56) 56
    else if (bits <= 64) 64
    else throw OFail()

  /** MSB-first bit unpacker over a byte array. */
  private final class BitR(data: Array[Byte], var bytePos: Int) {
    private var cur = 0
    private var bitsLeft = 0
    def read(w: Int): Long = {
      var v = 0L
      var need = w
      while (need > 0) {
        if (bitsLeft == 0) {
          if (bytePos >= data.length) throw OFail()
          cur = data(bytePos) & 0xff
          bytePos += 1
          bitsLeft = 8
        }
        val take = math.min(need, bitsLeft)
        v = (v << take) |
          ((cur >>> (bitsLeft - take)) & ((1 << take) - 1))
        bitsLeft -= take
        need -= take
      }
      v
    }
    /** Discard any partial byte (packed runs are byte-aligned). */
    def align(): Unit = bitsLeft = 0
  }

  private final class ByteR(val data: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= data.length) throw OFail()
      val v = data(p) & 0xff
      p += 1
      v
    }
    def varintU(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw OFail()
    }
    def varintS(): Long = zigzag(varintU())
    def done: Boolean = p >= data.length
  }

  /** Integer RLE version 1: runs (count = h+3, signed byte delta,
    * varint base) and literal groups (256-h varints).
    */
  def intRleV1(data: Array[Byte], n: Int, signed: Boolean)
      : Array[Long] = {
    val r = new ByteR(data, 0)
    val out = new Array[Long](n)
    var got = 0
    while (got < n) {
      val h = r.u8()
      if (h < 128) {
        val count = h + 3
        val delta = {
          val d = r.u8()
          if (d > 127) d - 256 else d
        }
        val base = if (signed) r.varintS() else r.varintU()
        var i = 0
        while (i < count) {
          if (got >= n) throw OFail()
          out(got) = base + i.toLong * delta
          got += 1
          i += 1
        }
      } else {
        val count = 256 - h
        var i = 0
        while (i < count) {
          if (got >= n) throw OFail()
          out(got) = if (signed) r.varintS() else r.varintU()
          got += 1
          i += 1
        }
      }
    }
    out
  }

  /** Integer RLE version 2: the four sub-encodings. */
  def intRleV2(data: Array[Byte], n: Int, signed: Boolean)
      : Array[Long] = {
    val r = new ByteR(data, 0)
    val out = new Array[Long](n)
    var got = 0
    while (got < n) {
      val b0 = r.u8()
      (b0 >>> 6) match {
        case 0 => // SHORT_REPEAT
          val w = ((b0 >>> 3) & 0x7) + 1
          val count = (b0 & 0x7) + 3
          var v = 0L
          var i = 0
          while (i < w) { v = (v << 8) | r.u8(); i += 1 }
          val value = if (signed) zigzag(v) else v
          i = 0
          while (i < count) {
            if (got >= n) throw OFail()
            out(got) = value
            got += 1
            i += 1
          }
        case 1 => // DIRECT
          val w = widthOf((b0 >>> 1) & 0x1f)
          val count = (((b0 & 1) << 8) | r.u8()) + 1
          val bits = new BitR(r.data, r.p)
          var i = 0
          while (i < count) {
            if (got >= n) throw OFail()
            val v = bits.read(w)
            out(got) = if (signed) zigzag(v) else v
            got += 1
            i += 1
          }
          bits.align()
          r.p = bits.bytePos
        case 2 => // PATCHED_BASE
          val w = widthOf((b0 >>> 1) & 0x1f)
          val count = (((b0 & 1) << 8) | r.u8()) + 1
          val b2 = r.u8()
          val bw = ((b2 >>> 5) & 0x7) + 1
          val pw = widthOf(b2 & 0x1f)
          val b3 = r.u8()
          val pgw = ((b3 >>> 5) & 0x7) + 1
          val pll = b3 & 0x1f
          var base = 0L
          var i = 0
          while (i < bw) { base = (base << 8) | r.u8(); i += 1 }
          // sign-magnitude: MSB of the BW-byte base is the sign
          val signMask = 1L << (bw * 8 - 1)
          if ((base & signMask) != 0) base = -(base & (signMask - 1))
          val bits = new BitR(r.data, r.p)
          val vals = new Array[Long](count)
          i = 0
          while (i < count) { vals(i) = bits.read(w); i += 1 }
          bits.align()
          val cfb = closestWidth(pgw + pw)
          val pbits = new BitR(r.data, bits.bytePos)
          var idx = 0
          i = 0
          while (i < pll) {
            val entry = pbits.read(cfb)
            val gap = (entry >>> pw).toInt
            val patch = entry & ((1L << pw) - 1)
            idx += gap
            if (idx >= count) throw OFail()
            vals(idx) |= patch << w
            i += 1
          }
          pbits.align()
          r.p = pbits.bytePos
          i = 0
          while (i < count) {
            if (got >= n) throw OFail()
            out(got) = base + vals(i)
            got += 1
            i += 1
          }
        case 3 => // DELTA
          val wc = (b0 >>> 1) & 0x1f
          val w = if (wc == 0) 0 else widthOf(wc)
          val count = (((b0 & 1) << 8) | r.u8()) + 1
          val base = if (signed) r.varintS() else r.varintU()
          if (got >= n) throw OFail()
          out(got) = base
          got += 1
          if (count > 1) {
            val deltaBase = r.varintS()
            if (got >= n) throw OFail()
            out(got) = out(got - 1) + deltaBase
            got += 1
            val sign = if (deltaBase < 0) -1L else 1L
            if (w == 0) {
              var i = 2
              while (i < count) {
                if (got >= n) throw OFail()
                out(got) = out(got - 1) + deltaBase
                got += 1
                i += 1
              }
            } else {
              val bits = new BitR(r.data, r.p)
              var i = 2
              while (i < count) {
                if (got >= n) throw OFail()
                out(got) = out(got - 1) + sign * bits.read(w)
                got += 1
                i += 1
              }
              bits.align()
              r.p = bits.bytePos
            }
          }
        case _ => throw OFail()
      }
    }
    out
  }

  /** Byte-RLE: runs (h+3 of the next byte) and literals (256-h). */
  def byteRle(data: Array[Byte], n: Int): Array[Byte] = {
    val r = new ByteR(data, 0)
    val out = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val h = r.u8()
      if (h < 128) {
        val count = h + 3
        val v = r.u8().toByte
        var i = 0
        while (i < count) {
          if (got >= n) throw OFail()
          out(got) = v
          got += 1
          i += 1
        }
      } else {
        val count = 256 - h
        var i = 0
        while (i < count) {
          if (got >= n) throw OFail()
          out(got) = r.u8().toByte
          got += 1
          i += 1
        }
      }
    }
    out
  }

  /** Boolean stream: byte-RLE bytes holding bits MSB-first. */
  def boolRle(data: Array[Byte], n: Int): Array[Boolean] = {
    val bytes = byteRle(data, (n + 7) / 8)
    Array.tabulate(n)(i =>
      ((bytes(i >> 3) >> (7 - (i & 7))) & 1) == 1)
  }

  // ---------------------------------------------------------------
  // file walk: postscript → footer → stripes → streams
  // ---------------------------------------------------------------

  private final case class Stripe(off: Long, idxLen: Long,
      dataLen: Long, ftLen: Long, rows: Long)

  private final case class FileShape(codec: Int,
      stripes: Vector[Stripe], colIds: Map[String, Int],
      kinds: Vector[Int])

  private def fileShape(b: Array[Byte]): FileShape = {
    if (b == null || b.length < 8) throw OFail()
    val psLen = b(b.length - 1) & 0xff
    if (psLen <= 0 || psLen >= b.length - 1 || psLen > 256)
      throw OFail()
    val psr = new Reader(b, b.length - 1 - psLen, b.length - 1)
    var footerLen = -1L
    var codec = 0
    var magic = ""
    fields(psr) { (field, wire) =>
      field match {
        case 1 if wire == 0 => footerLen = psr.varint()
        case 2 if wire == 0 => codec = psr.varint().toInt
        case 8000 if wire == 2 =>
          val (f, u) = psr.bytes(psr.varint())
          magic = new String(b, f, u - f,
            java.nio.charset.StandardCharsets.US_ASCII)
        case _ => psr.skip(wire)
      }
    }
    if (magic != "ORC" || footerLen <= 0 ||
      footerLen > b.length - 1 - psLen) throw OFail()
    val footerStart = b.length - 1 - psLen - footerLen.toInt
    val fb = (if (codec == 0)
      Some(java.util.Arrays.copyOfRange(b, footerStart,
        footerStart + footerLen.toInt))
    else inflateRegion(b, footerStart, footerStart + footerLen.toInt,
      codec)).getOrElse(throw OFail())
    val stripes = Vector.newBuilder[Stripe]
    // types in order; root struct's fieldNames map names → ids
    val kinds = Vector.newBuilder[Int]
    var names = Vector.empty[String]
    var subtypes = Vector.empty[Int]
    var typeAt = 0
    val fr = new Reader(fb, 0, fb.length)
    fields(fr) { (field, wire) =>
      field match {
        case 3 if wire == 2 =>
          val (f, u) = fr.bytes(fr.varint())
          var off, il, dl, fl, rows = -1L
          val sr = new Reader(fb, f, u)
          fields(sr) { (sf, sw) =>
            if (sw == 0) sf match {
              case 1 => off = sr.varint()
              case 2 => il = sr.varint()
              case 3 => dl = sr.varint()
              case 4 => fl = sr.varint()
              case 5 => rows = sr.varint()
              case _ => sr.skip(sw)
            } else sr.skip(sw)
          }
          if (off < 0 || il < 0 || dl < 0 || fl < 0 || rows < 0)
            throw OFail()
          stripes += Stripe(off, il, dl, fl, rows)
        case 4 if wire == 2 =>
          val (f, u) = fr.bytes(fr.varint())
          var kind = 0
          val tr = new Reader(fb, f, u)
          fields(tr) { (tf, tw) =>
            tf match {
              case 1 if tw == 0 => kind = tr.varint().toInt
              case 2 if tw == 0 => // repeated uint, unpacked
                val st = tr.varint().toInt
                if (typeAt == 0) subtypes :+= st
              case 2 if tw == 2 => // repeated uint, PACKED
                val (pf, pu) = tr.bytes(tr.varint())
                val pr = new Reader(fb, pf, pu)
                while (pr.p < pr.end) {
                  val st = pr.varint().toInt
                  if (typeAt == 0) subtypes :+= st
                }
              case 3 if tw == 2 =>
                val (nf, nu) = tr.bytes(tr.varint())
                if (typeAt == 0)
                  names :+= new String(fb, nf, nu - nf,
                    java.nio.charset.StandardCharsets.UTF_8)
              case _ => tr.skip(tw)
            }
          }
          kinds += kind
          typeAt += 1
        case _ => fr.skip(wire)
      }
    }
    val ks = kinds.result()
    if (ks.isEmpty || ks.head != 12) throw OFail() // root: struct
    val ids =
      if (subtypes.length == names.length && names.nonEmpty)
        names.zip(subtypes).toMap
      else names.zipWithIndex.map { case (n, i) => n -> (i + 1) }
        .toMap
    FileShape(codec, stripes.result(), ids, ks)
  }

  // stream kinds (spec): PRESENT=0 DATA=1 LENGTH=2 DICT_DATA=3
  private final case class StreamAt(kind: Int, column: Int,
      from: Long, len: Long)

  /** Parse one stripe's footer: stream locations (offsets resolved
    * from the stripe base in declaration order) and per-column
    * encodings (kind, dictionarySize).
    */
  private def stripeStreams(b: Array[Byte], codec: Int, s: Stripe)
      : (Vector[StreamAt], Vector[(Int, Int)]) = {
    val ftFrom = s.off + s.idxLen + s.dataLen
    val fb = (if (codec == 0)
      Some(java.util.Arrays.copyOfRange(b, ftFrom.toInt,
        (ftFrom + s.ftLen).toInt))
    else inflateRegion(b, ftFrom.toInt, (ftFrom + s.ftLen).toInt,
      codec)).getOrElse(throw OFail())
    val streams = Vector.newBuilder[StreamAt]
    val encodings = Vector.newBuilder[(Int, Int)]
    var at = s.off
    val r = new Reader(fb, 0, fb.length)
    fields(r) { (field, wire) =>
      field match {
        case 1 if wire == 2 =>
          val (f, u) = r.bytes(r.varint())
          var kind = 0
          var column = 0
          var len = 0L
          val sr = new Reader(fb, f, u)
          fields(sr) { (sf, sw) =>
            if (sw == 0) sf match {
              case 1 => kind = sr.varint().toInt
              case 2 => column = sr.varint().toInt
              case 3 => len = sr.varint()
              case _ => sr.skip(sw)
            } else sr.skip(sw)
          }
          streams += StreamAt(kind, column, at, len)
          at += len
        case 2 if wire == 2 =>
          val (f, u) = r.bytes(r.varint())
          var kind = 0
          var dictSize = 0
          val er = new Reader(fb, f, u)
          fields(er) { (ef, ew) =>
            if (ew == 0) ef match {
              case 1 => kind = er.varint().toInt
              case 2 => dictSize = er.varint().toInt
              case _ => er.skip(ew)
            } else er.skip(ew)
          }
          encodings += ((kind, dictSize))
        case _ => r.skip(wire)
      }
    }
    (streams.result(), encodings.result())
  }

  private def streamBytes(b: Array[Byte], codec: Int, st: StreamAt)
      : Array[Byte] = {
    if (st.from < 0 || st.len < 0 ||
      st.from + st.len > b.length) throw OFail()
    if (codec == 0)
      java.util.Arrays.copyOfRange(b, st.from.toInt,
        (st.from + st.len).toInt)
    else inflateRegion(b, st.from.toInt, (st.from + st.len).toInt,
      codec).getOrElse(throw OFail())
  }

  // ---------------------------------------------------------------
  // the column decode
  // ---------------------------------------------------------------

  final case class OrcCol(kind: String, values: Array[AnyRef],
      nNulls: Int, nStripes: Int, encodings: Set[String])

  private val KindNames = Map(0 -> "boolean", 1 -> "byte",
    2 -> "short", 3 -> "int", 4 -> "long", 5 -> "float",
    6 -> "double", 7 -> "string", 15 -> "date")

  private val EncNames = Map(0 -> "DIRECT", 1 -> "DICTIONARY",
    2 -> "DIRECT_V2", 3 -> "DICTIONARY_V2")

  private def le32f(a: Array[Byte], o: Int): Float = {
    if (o + 4 > a.length) throw OFail()
    java.lang.Float.intBitsToFloat((a(o) & 0xff) |
      ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) |
      ((a(o + 3) & 0xff) << 24))
  }
  private def le64d(a: Array[Byte], o: Int): Double = {
    if (o + 8 > a.length) throw OFail()
    var v = 0L
    var j = 0
    while (j < 8) { v |= (a(o + j) & 0xffL) << (8 * j); j += 1 }
    java.lang.Double.longBitsToDouble(v)
  }

  /** Decode EVERY value of a top-level column across all stripes.
    * None on refusal (nested columns, unknown encodings, damage).
    */
  def readOrcColumn(b: Array[Byte], name: String): Option[OrcCol] =
    try {
      val shape = fileShape(b)
      val colId = shape.colIds.getOrElse(name, throw OFail())
      if (colId <= 0 || colId >= shape.kinds.length) throw OFail()
      val kind = shape.kinds(colId)
      if (!KindNames.contains(kind)) throw OFail()
      val out = Array.newBuilder[AnyRef]
      var nNulls = 0
      val encs = Set.newBuilder[String]
      shape.stripes.foreach { s =>
        val (streams, encodings) = stripeStreams(b, shape.codec, s)
        if (colId >= encodings.length) throw OFail()
        val (encKind, dictSize) = encodings(colId)
        encs += EncNames.getOrElse(encKind, "?")
        def stream(k: Int): Option[Array[Byte]] =
          streams.find(st => st.kind == k && st.column == colId)
            .map(st => streamBytes(b, shape.codec, st))
        val rows = s.rows.toInt
        val present = stream(0).map(boolRle(_, rows))
        val nVals = present.map(_.count(identity)).getOrElse(rows)
        def rle(data: Array[Byte], n: Int, signed: Boolean)
            : Array[Long] = encKind match {
          case 0 | 1 => intRleV1(data, n, signed)
          case _ => intRleV2(data, n, signed)
        }
        val defined: Array[AnyRef] = kind match {
          case 0 => // boolean
            val data = stream(1).getOrElse(throw OFail())
            boolRle(data, nVals)
              .map(v => java.lang.Boolean.valueOf(v)
                .asInstanceOf[AnyRef])
          case 1 => // byte
            byteRle(stream(1).getOrElse(throw OFail()), nVals)
              .map(v => java.lang.Long.valueOf(v.toLong)
                .asInstanceOf[AnyRef])
          case 2 | 3 | 4 | 15 => // short / int / long / date(days)
            rle(stream(1).getOrElse(throw OFail()), nVals,
              signed = true)
              .map(v => java.lang.Long.valueOf(v)
                .asInstanceOf[AnyRef])
          case 5 =>
            val data = stream(1).getOrElse(throw OFail())
            Array.tabulate[AnyRef](nVals)(i =>
              java.lang.Float.valueOf(le32f(data, i * 4)))
          case 6 =>
            val data = stream(1).getOrElse(throw OFail())
            Array.tabulate[AnyRef](nVals)(i =>
              java.lang.Double.valueOf(le64d(data, i * 8)))
          case 7 => // string
            encKind match {
              case 0 | 2 => // DIRECT: LENGTH + concatenated DATA
                val lens = rle(stream(2).getOrElse(throw OFail()),
                  nVals, signed = false)
                val data = stream(1).getOrElse(throw OFail())
                var q = 0
                lens.map { len =>
                  if (len < 0 || q + len > data.length)
                    throw OFail()
                  val v = new String(data, q, len.toInt,
                    java.nio.charset.StandardCharsets.UTF_8)
                  q += len.toInt
                  v.asInstanceOf[AnyRef]
                }
              case 1 | 3 => // DICTIONARY: indices into LENGTH+DATA
                val dictLens = rle(
                  stream(2).getOrElse(throw OFail()), dictSize,
                  signed = false)
                val dictData = stream(3).getOrElse(throw OFail())
                var q = 0
                val dict = dictLens.map { len =>
                  if (len < 0 || q + len > dictData.length)
                    throw OFail()
                  val v = new String(dictData, q, len.toInt,
                    java.nio.charset.StandardCharsets.UTF_8)
                  q += len.toInt
                  v
                }
                rle(stream(1).getOrElse(throw OFail()), nVals,
                  signed = false).map { ix =>
                  if (ix < 0 || ix >= dict.length) throw OFail()
                  dict(ix.toInt).asInstanceOf[AnyRef]
                }
              case _ => throw OFail()
            }
          case _ => throw OFail()
        }
        if (defined.length != nVals) throw OFail()
        present match {
          case None => defined.foreach(out += _)
          case Some(bits) =>
            var di = 0
            bits.foreach { p =>
              if (p) { out += defined(di); di += 1 }
              else { out += null; nNulls += 1 }
            }
        }
      }
      Some(OrcCol(KindNames(kind), out.result(), nNulls,
        shape.stripes.length, encs.result()))
    } catch {
      case _: OFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: ClassCastException => None
    }

  // ---------------------------------------------------------------
  // Spark plumbing: the stripe-read census query
  // ---------------------------------------------------------------

  /** The nullable fixture (400 rows, tag null every 7th, dbl null
    * every 11th) — present streams on the wire.
    */
  lazy val NullableFixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/orc/fx7.orc")
    require(in != null, "missing orc nullable fixture")
    try in.readAllBytes() finally in.close()
  }

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  val orcReadSchema: StructType = StructType(Seq(
    StructField("n_values", IntegerType),
    StructField("n_stripes", IntegerType),
    StructField("id_sum", LongType),
    StructField("id_probe", LongType),
    StructField("s_probe", StringType),
    StructField("s_dict", BooleanType),
    StructField("t_n_nulls", IntegerType),
    StructField("t_probe", StringType),
    StructField("d_probe", DoubleType)))

  /** One row per doc: the full stripe decode of the committed
    * stats fixture (5000 sorted ids across 5 stripes, dictionary
    * strings) and the nullable fixture (present streams), each
    * parsed ONCE per partition, plus LIVE per-doc point lookups —
    * value[doc_id % n] replays closed-form, so a misdecode in the
    * RLE/dictionary/present chain breaks the oracle hash.
    */
  def orcReadRows(df: DataFrame, idCol: String): DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields(ii) +:
      orcReadSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      val stats = Orc.StatsFixture
      val ids = readOrcColumn(stats, "id")
      val ss = readOrcColumn(stats, "s")
      val tags = readOrcColumn(NullableFixture, "tag")
      val dbls = readOrcColumn(NullableFixture, "dbl")
      val summary = for { c <- ids; s <- ss; t <- tags; d <- dbls }
        yield {
        val sum = c.values.foldLeft(0L)((a, v) =>
          a + v.asInstanceOf[java.lang.Long].longValue())
        (c, s, t, d, sum)
      }
      it.map { r =>
        summary match {
          case Some((c, s, t, d, sum)) =>
            val id = r.get(ii) match {
              case l: java.lang.Long => l.longValue()
              case x => x.hashCode().toLong
            }
            val p = java.lang.Math
              .floorMod(id, c.values.length.toLong).toInt
            val q = java.lang.Math
              .floorMod(id, t.values.length.toLong).toInt
            Row(r.get(ii), c.values.length, c.nStripes, sum,
              c.values(p), s.values(p),
              s.encodings.contains("DICTIONARY_V2"),
              t.nNulls, t.values(q), d.values(q))
          case None =>
            Row(r.get(ii), null, null, null, null, null, null,
              null, null, null)
        }
      }
    }(enc)
  }
}
