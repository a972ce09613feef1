package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ORC FOOTER triage from raw bytes (C228) — the other columnar
  * format data lakes carry as opaque blobs, next to C218's parquet.
  * The layout is public (the Apache ORC spec): the file ends with a
  * one-byte postscript length; the UNCOMPRESSED protobuf PostScript
  * carries the footer length, compression codec, and the "ORC"
  * magic as field 8000; the Footer protobuf (compressed in
  * 3-byte-header chunks when the codec isn't NONE) carries stripes,
  * the type tree and row counts.
  *
  * Surfaced: codec name, total rows, stripe count and their summed
  * row counts, type-tree size, root column names and their kinds —
  * the triage facts a lake census needs without launching a reader
  * per blob. Chunk decompression rides the house codecs: raw
  * DEFLATE (zlib), [[Snappy]], [[Zstd]], and [[Lz4.decodeRawBlock]]
  * — LZO refuses honestly (no house decoder).
  *
  * Pinning: the fixtures are written by Spark's own ORC writer —
  * the reference implementation on this classpath — across five
  * codecs, a nested schema and a multi-stripe file; OrcSpec also
  * cross-checks against a live `spark.read.orc` of the same bytes.
  *
  * Totality: None on damage; all bounds checked. Scale: footer-only
  * map work — never touches stripe data.
  */
object Orc {

  private val MaxFooter = 8 << 20
  private val MaxList = 100000

  final case class OrcMeta(compression: String, numRows: Long,
      nStripes: Int, stripeRows: Long, nTypes: Int,
      colNames: Seq[String], kinds: Seq[String])

  private final case class OFail() extends RuntimeException

  private final class Reader(val b: Array[Byte], var p: Int,
      val end: Int) {
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (true) {
        if (p >= end || shift > 63) throw OFail()
        val x = b(p) & 0xff
        p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      0L
    }
    def bytes(n: Long): (Int, Int) = {
      if (n < 0 || n > end - p) throw OFail()
      val r = (p, p + n.toInt)
      p += n.toInt
      r
    }
    /** Skip one field of `wire` type. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => bytes(8)
      case 2 => bytes(varint())
      case 5 => bytes(4)
      case _ => throw OFail()
    }
  }

  /** Walk fields of one message span, calling f(fieldNo, wire,
    * reader); f must consume the value or call skip.
    */
  private def fields(r: Reader)(f: (Int, Int) => Unit): Unit = {
    var guard = 0
    while (r.p < r.end) {
      guard += 1
      if (guard > MaxList) throw OFail()
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field <= 0) throw OFail()
      f(field, wire)
    }
  }

  private val CodecNames = Map(0 -> "none", 1 -> "zlib",
    2 -> "snappy", 3 -> "lzo", 4 -> "lz4", 5 -> "zstd",
    6 -> "brotli")

  private val KindNames = Map(0 -> "boolean", 1 -> "byte",
    2 -> "short", 3 -> "int", 4 -> "long", 5 -> "float",
    6 -> "double", 7 -> "string", 8 -> "binary", 9 -> "timestamp",
    10 -> "list", 11 -> "map", 12 -> "struct", 13 -> "union",
    14 -> "decimal", 15 -> "date", 16 -> "varchar", 17 -> "char",
    18 -> "timestamp_instant")

  /** Decompress the chunked footer region per the ORC framing:
    * 3-byte LE headers, low bit = stored-original.
    */
  private def inflateRegion(b: Array[Byte], from: Int, until: Int,
      codec: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = from
    while (p < until) {
      if (until - p < 3) return None
      val h = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16)
      p += 3
      val original = (h & 1) == 1
      val clen = h >>> 1
      if (clen <= 0 || clen > until - p) return None
      if (original) out.write(b, p, clen)
      else {
        val chunk = codec match {
          case 1 => // zlib = raw deflate
            try {
              val inf = new java.util.zip.Inflater(true)
              inf.setInput(b, p, clen)
              val buf = new Array[Byte](8192)
              val acc = new java.io.ByteArrayOutputStream()
              while (!inf.finished() && acc.size <= MaxFooter) {
                val n = inf.inflate(buf)
                if (n == 0 && !inf.finished()) throw OFail()
                acc.write(buf, 0, n)
              }
              inf.end()
              if (acc.size > MaxFooter) None else Some(acc.toByteArray)
            } catch {
              case _: java.util.zip.DataFormatException => None
              case _: OFail => None
            }
          case 2 =>
            Snappy.decompress(
              java.util.Arrays.copyOfRange(b, p, p + clen), MaxFooter)
          case 4 => Lz4.decodeRawBlock(b, p, p + clen, MaxFooter)
          case 5 =>
            Zstd.decompress(
              java.util.Arrays.copyOfRange(b, p, p + clen))
          case _ => None // lzo / brotli / unknown: honest refusal
        }
        chunk match {
          case Some(c) if c.length <= MaxFooter => out.write(c)
          case _ => return None
        }
      }
      p += clen
      if (out.size > MaxFooter) return None
    }
    Some(out.toByteArray)
  }

  /** Parse an ORC file's postscript + footer. None on damage. */
  def orcMeta(b: Array[Byte]): Option[OrcMeta] = {
    if (b == null || b.length < 8) return None
    val psLen = b(b.length - 1) & 0xff
    if (psLen <= 0 || psLen >= b.length - 1 || psLen > 256)
      return None
    try {
      // ---- postscript (uncompressed protobuf)
      val psr = new Reader(b, b.length - 1 - psLen, b.length - 1)
      var footerLen = -1L
      var codec = 0
      var metadataLen = 0L
      var magic = ""
      fields(psr) { (field, wire) =>
        field match {
          case 1 if wire == 0 => footerLen = psr.varint()
          case 2 if wire == 0 => codec = psr.varint().toInt
          case 5 if wire == 0 => metadataLen = psr.varint()
          case 8000 if wire == 2 =>
            val (f, u) = psr.bytes(psr.varint())
            magic = new String(b, f, u - f,
              java.nio.charset.StandardCharsets.US_ASCII)
          case _ => psr.skip(wire)
        }
      }
      if (magic != "ORC" || footerLen <= 0 ||
        footerLen > b.length - 1 - psLen) return None
      val footerStart = b.length - 1 - psLen - footerLen.toInt
      if (footerStart < 0) return None

      // ---- footer bytes (chunk-inflate unless NONE)
      val fb =
        if (codec == 0)
          java.util.Arrays.copyOfRange(b, footerStart,
            footerStart + footerLen.toInt)
        else inflateRegion(b, footerStart,
          footerStart + footerLen.toInt, codec).getOrElse(return None)

      // ---- footer protobuf
      final case class OType(kind: Int,
          subtypes: scala.collection.mutable.ArrayBuffer[Int],
          names: scala.collection.mutable.ArrayBuffer[String])
      val types = scala.collection.mutable.ArrayBuffer[OType]()
      var numRows = -1L
      var nStripes = 0
      var stripeRows = 0L
      val fr = new Reader(fb, 0, fb.length)
      fields(fr) { (field, wire) =>
        field match {
          case 3 if wire == 2 => // StripeInformation
            val (f, u) = fr.bytes(fr.varint())
            nStripes += 1
            if (nStripes > MaxList) throw OFail()
            val sr = new Reader(fb, f, u)
            fields(sr) { (sf, sw) =>
              if (sf == 5 && sw == 0) stripeRows += sr.varint()
              else sr.skip(sw)
            }
          case 4 if wire == 2 => // Type
            val (f, u) = fr.bytes(fr.varint())
            if (types.length > MaxList) throw OFail()
            val t = OType(0,
              scala.collection.mutable.ArrayBuffer[Int](),
              scala.collection.mutable.ArrayBuffer[String]())
            var kind = 0
            val tr = new Reader(fb, f, u)
            fields(tr) { (tf, tw) =>
              tf match {
                case 1 if tw == 0 => kind = tr.varint().toInt
                case 2 if tw == 2 => // packed subtypes
                  val (pf, pu) = tr.bytes(tr.varint())
                  val pr = new Reader(fb, pf, pu)
                  while (pr.p < pr.end) {
                    if (t.subtypes.length > MaxList) throw OFail()
                    t.subtypes += pr.varint().toInt
                  }
                case 2 if tw == 0 => // unpacked single
                  t.subtypes += tr.varint().toInt
                case 3 if tw == 2 =>
                  val (nf, nu) = tr.bytes(tr.varint())
                  if (t.names.length > MaxList) throw OFail()
                  t.names += new String(fb, nf, nu - nf,
                    java.nio.charset.StandardCharsets.UTF_8)
                case _ => tr.skip(tw)
              }
            }
            types += t.copy(kind = kind)
          case 6 if wire == 0 => numRows = fr.varint()
          case _ => fr.skip(wire)
        }
      }
      if (numRows < 0 || types.isEmpty) return None
      val root = types(0)
      if (root.subtypes.exists(i => i < 0 || i >= types.length))
        return None
      Some(OrcMeta(CodecNames.getOrElse(codec, s"codec$codec"),
        numRows, nStripes, stripeRows, types.length,
        root.names.toSeq,
        root.subtypes.toSeq.map(i =>
          KindNames.getOrElse(types(i).kind, s"kind${types(i).kind}"))))
    } catch {
      case _: OFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ---------------------------------------------------------------
  // stripe/column STATISTICS census (round 17) — the facts that
  // drive file/stripe skipping at 100 TB: the footer's file-level
  // ColumnStatistics (field 7) and the Metadata section's per-stripe
  // StripeStatistics (postscript metadataLength bytes immediately
  // before the footer, chunk-compressed the same way). A reader that
  // can answer "which stripes can contain v?" from these never
  // touches the other stripes' data.
  // ---------------------------------------------------------------

  /** One column's statistics: counts plus the int/string stat
    * messages (ORC proto: IntegerStatistics sint64 min/max/sum,
    * StringStatistics min/max + sint64 total length).
    */
  final case class OrcColStat(nVals: Long, hasNull: Boolean,
      intMin: Option[Long], intMax: Option[Long],
      intSum: Option[Long], strMin: Option[String],
      strMax: Option[String], strLenSum: Option[Long])

  /** File-level stats (indexed by type id, 0 = root struct) and the
    * same per stripe.
    */
  final case class OrcStats(fileCols: Vector[OrcColStat],
      stripes: Vector[Vector[OrcColStat]])

  private def zig(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Parse one ColumnStatistics message over `buf[f, u)`. */
  private def colStat(buf: Array[Byte], f: Int, u: Int)
      : OrcColStat = {
    var nVals = 0L
    var hasNull = false
    var iMin, iMax, iSum: Option[Long] = None
    var sMin, sMax: Option[String] = None
    var sSum: Option[Long] = None
    val r = new Reader(buf, f, u)
    fields(r) { (field, wire) =>
      field match {
        case 1 if wire == 0 => nVals = r.varint()
        case 2 if wire == 2 => // IntegerStatistics
          val (f2, u2) = r.bytes(r.varint())
          val ir = new Reader(buf, f2, u2)
          fields(ir) { (sf, sw) =>
            if (sw == 0) sf match {
              case 1 => iMin = Some(zig(ir.varint()))
              case 2 => iMax = Some(zig(ir.varint()))
              case 3 => iSum = Some(zig(ir.varint()))
              case _ => ir.skip(sw)
            } else ir.skip(sw)
          }
        case 4 if wire == 2 => // StringStatistics
          val (f2, u2) = r.bytes(r.varint())
          val sr = new Reader(buf, f2, u2)
          fields(sr) { (sf, sw) =>
            sf match {
              case 1 if sw == 2 =>
                val (a, b2) = sr.bytes(sr.varint())
                sMin = Some(new String(buf, a, b2 - a,
                  java.nio.charset.StandardCharsets.UTF_8))
              case 2 if sw == 2 =>
                val (a, b2) = sr.bytes(sr.varint())
                sMax = Some(new String(buf, a, b2 - a,
                  java.nio.charset.StandardCharsets.UTF_8))
              case 3 if sw == 0 => sSum = Some(zig(sr.varint()))
              case _ => sr.skip(sw)
            }
          }
        case 10 if wire == 0 => hasNull = r.varint() != 0
        case _ => r.skip(wire)
      }
    }
    OrcColStat(nVals, hasNull, iMin, iMax, iSum, sMin, sMax, sSum)
  }

  /** Parse the statistics surfaces: footer field 7 (file-level) and
    * the Metadata section (per-stripe). None on damage or when the
    * file carries no metadata section.
    */
  def orcStats(b: Array[Byte]): Option[OrcStats] = {
    if (b == null || b.length < 8) return None
    val psLen = b(b.length - 1) & 0xff
    if (psLen <= 0 || psLen >= b.length - 1 || psLen > 256)
      return None
    try {
      val psr = new Reader(b, b.length - 1 - psLen, b.length - 1)
      var footerLen = -1L
      var codec = 0
      var metadataLen = 0L
      var magic = ""
      fields(psr) { (field, wire) =>
        field match {
          case 1 if wire == 0 => footerLen = psr.varint()
          case 2 if wire == 0 => codec = psr.varint().toInt
          case 5 if wire == 0 => metadataLen = psr.varint()
          case 8000 if wire == 2 =>
            val (f, u) = psr.bytes(psr.varint())
            magic = new String(b, f, u - f,
              java.nio.charset.StandardCharsets.US_ASCII)
          case _ => psr.skip(wire)
        }
      }
      if (magic != "ORC" || footerLen <= 0 ||
        footerLen > b.length - 1 - psLen) return None
      val footerStart = b.length - 1 - psLen - footerLen.toInt
      if (footerStart < 0 || metadataLen < 0 ||
        metadataLen > footerStart) return None
      def section(from: Int, len: Int): Option[Array[Byte]] =
        if (codec == 0)
          Some(java.util.Arrays.copyOfRange(b, from, from + len))
        else inflateRegion(b, from, from + len, codec)

      // ---- file-level: footer field 7 (repeated ColumnStatistics)
      val fb = section(footerStart, footerLen.toInt)
        .getOrElse(return None)
      val fileCols = Vector.newBuilder[OrcColStat]
      val fr = new Reader(fb, 0, fb.length)
      fields(fr) { (field, wire) =>
        field match {
          case 7 if wire == 2 =>
            val (f, u) = fr.bytes(fr.varint())
            fileCols += colStat(fb, f, u)
          case _ => fr.skip(wire)
        }
      }

      // ---- per-stripe: the Metadata section
      val stripes = Vector.newBuilder[Vector[OrcColStat]]
      if (metadataLen > 0) {
        val metaStart = footerStart - metadataLen.toInt
        val mb = section(metaStart, metadataLen.toInt)
          .getOrElse(return None)
        val mr = new Reader(mb, 0, mb.length)
        fields(mr) { (field, wire) =>
          field match {
            case 1 if wire == 2 => // StripeStatistics
              val (f, u) = mr.bytes(mr.varint())
              val cols = Vector.newBuilder[OrcColStat]
              val sr = new Reader(mb, f, u)
              fields(sr) { (sf, sw) =>
                if (sf == 1 && sw == 2) {
                  val (cf, cu) = sr.bytes(sr.varint())
                  cols += colStat(mb, cf, cu)
                } else sr.skip(sw)
              }
              stripes += cols.result()
            case _ => mr.skip(wire)
          }
        }
      }
      val fc = fileCols.result()
      if (fc.isEmpty) return None
      Some(OrcStats(fc, stripes.result()))
    } catch {
      case _: OFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ---------------------------------------------------------------
  // Spark plumbing (fixtures are Spark-written; see OrcFixtureGen)
  // ---------------------------------------------------------------

  val orcSchema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("num_rows", LongType),
    StructField("n_stripes", IntegerType),
    StructField("stripe_rows", LongType),
    StructField("n_types", IntegerType),
    StructField("col_names", StringType),
    StructField("kinds", StringType)))

  def decodeOrc(bytes: Array[Byte]): Seq[Any] =
    orcMeta(bytes) match {
      case Some(m) => Seq[Any](m.compression, m.numRows,
        m.nStripes, m.stripeRows, m.nTypes,
        m.colNames.mkString(","), m.kinds.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null, null)
    }

  val orcStatsSchema: StructType = StructType(Seq(
    StructField("n_stripes_stats", IntegerType),
    StructField("file_min", LongType),
    StructField("file_max", LongType),
    StructField("file_sum", LongType),
    StructField("file_nvals", LongType),
    StructField("has_null", BooleanType),
    StructField("str_min", StringType),
    StructField("str_max", StringType),
    StructField("str_len_sum", LongType),
    StructField("stripe_mins", StringType),
    StructField("stripe_maxs", StringType)))

  /** Stats decode kernel over a (root, long, string) schema: the
    * file-level stats of the long column (type id 1) and string
    * column (id 2), plus the per-stripe long-column min/max as CSV —
    * the raw material the ENGINE then prunes with (the query does
    * the interval arithmetic in codegen'd array functions, exactly
    * the stripe-skipping decision a 100 TB reader makes). Null row
    * for refusals or schema mismatch.
    */
  def decodeOrcStats(bytes: Array[Byte]): Seq[Any] =
    orcStats(bytes) match {
      case Some(OrcStats(fc, stripes))
          if fc.length >= 3 && stripes.forall(_.length >= 3) &&
            fc(1).intMin.isDefined && fc(2).strMin.isDefined &&
            stripes.forall(s => s(1).intMin.isDefined &&
              s(1).intMax.isDefined) =>
        Seq[Any](stripes.length,
          fc(1).intMin.get, fc(1).intMax.get,
          fc(1).intSum.getOrElse(null),
          fc(1).nVals, fc(1).hasNull,
          fc(2).strMin.get, fc(2).strMax.get,
          fc(2).strLenSum.getOrElse(null),
          stripes.map(_(1).intMin.get).mkString(","),
          stripes.map(_(1).intMax.get).mkString(","))
      case _ => Seq[Any](null, null, null, null, null, null, null,
        null, null, null, null)
    }

  /** The committed reference fixtures, loaded once per executor. */
  lazy val Fixtures: IndexedSeq[Array[Byte]] = {
    (0 until 5).map { i =>
      val in = getClass.getResourceAsStream(s"/orc/fx$i.orc")
      require(in != null, s"missing orc fixture $i")
      try in.readAllBytes() finally in.close()
    }
  }

  /** The deliberately-striped stats fixture (5000 rows, exact
    * 1000-row stripes via orc.stripe.row.count; see OrcFixtureGen).
    */
  lazy val StatsFixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/orc/fx5.orc")
    require(in != null, "missing orc stats fixture")
    try in.readAllBytes() finally in.close()
  }

  /** Per-row stats-fixture attach (map-only). */
  def synthOrcStats(df: DataFrame, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      val fx = StatsFixture
      it.map(r => Row.fromSeq(r.toSeq :+ fx))
    }(enc)
  }

  /** Per-row fixture attach: doc_id % 5 selects the Spark-written
    * reference file (map-only).
    */
  def synthOrcs(df: DataFrame, idCol: String, outCol: String)
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
        Row.fromSeq(r.toSeq :+
          Fixtures(java.lang.Math.floorMod(id, 5L).toInt))
      }
    }(enc)
  }
}
