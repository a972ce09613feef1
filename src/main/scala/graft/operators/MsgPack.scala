package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MessagePack census (C233) — the other binary JSON (Redis
  * payloads, Fluentd logs, game/api caches). The wire grammar is
  * public (the msgpack spec): one-byte format codes covering
  * fixint/fixmap/fixarray/fixstr, nil/bool, the sized int/uint
  * families, float32/64, str/bin 8/16/32, array/map 16/32, and
  * ext 1-16 bytes plus ext 8/16/32.
  *
  * Like C227/C232 this is a STRUCTURE census: top kind, top
  * container length, node count, max depth, ext count — plus
  * strict well-formedness (exactly one item, no trailing bytes).
  *
  * Pinning: the spec's own README examples (`{"compact":true,
  * "schema":0}` ↔ 18 bytes) are replayed in MsgPackSpec next to
  * writer round-trips; no reference implementation ships in this
  * environment (probe recorded r15).
  *
  * Totality: None on damage; node/depth bounds. Scale: per-value
  * map-only, one linear pass.
  */
object MsgPack {

  private val MaxNodes = 1 << 20
  private val MaxDepth = 64

  final case class MpFacts(topKind: String, nItems: Option[Long],
      nNodes: Long, maxDepth: Int, nExts: Long)

  private final case class MFail() extends RuntimeException

  /** Census one msgpack item; strict: no trailing bytes. */
  def mpCensus(b: Array[Byte]): Option[MpFacts] = {
    if (b == null || b.length == 0) return None
    try {
      var p = 0
      var nNodes = 0L
      var nExts = 0L
      var maxDepth = 0

      def u8(): Int = {
        if (p >= b.length) throw MFail()
        val v = b(p) & 0xff; p += 1; v
      }
      def beN(n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) { v = (v << 8) | u8(); i += 1 }
        v
      }
      def skipN(n: Long): Unit = {
        if (n < 0 || n > b.length - p) throw MFail()
        p += n.toInt
      }

      /** Walk one item; returns (kind, container length). */
      def item(depth: Int): (String, Long) = {
        if (depth > MaxDepth) throw MFail()
        nNodes += 1
        if (nNodes > MaxNodes) throw MFail()
        if (depth > maxDepth) maxDepth = depth
        val c = u8()
        def walkArray(n: Long): (String, Long) = {
          if (n > MaxNodes) throw MFail()
          var i = 0L
          while (i < n) { item(depth + 1); i += 1 }
          ("array", n)
        }
        def walkMap(n: Long): (String, Long) = {
          if (n > MaxNodes) throw MFail()
          var i = 0L
          while (i < n) { item(depth + 1); item(depth + 1); i += 1 }
          ("map", n)
        }
        c match {
          case x if x <= 0x7f => ("int", -1L) // positive fixint
          case x if x >= 0xe0 => ("int", -1L) // negative fixint
          case x if x >= 0x80 && x <= 0x8f => walkMap((x & 0x0f).toLong)
          case x if x >= 0x90 && x <= 0x9f =>
            walkArray((x & 0x0f).toLong)
          case x if x >= 0xa0 && x <= 0xbf =>
            skipN((x & 0x1f).toLong); ("str", (x & 0x1f).toLong)
          case 0xc0 => ("nil", -1L)
          case 0xc1 => throw MFail() // never used per spec
          case 0xc2 | 0xc3 => ("bool", -1L)
          case 0xc4 => val n = beN(1); skipN(n); ("bin", n)
          case 0xc5 => val n = beN(2); skipN(n); ("bin", n)
          case 0xc6 => val n = beN(4); skipN(n); ("bin", n)
          case 0xc7 =>
            val n = beN(1); u8(); skipN(n); nExts += 1; ("ext", n)
          case 0xc8 =>
            val n = beN(2); u8(); skipN(n); nExts += 1; ("ext", n)
          case 0xc9 =>
            val n = beN(4); u8(); skipN(n); nExts += 1; ("ext", n)
          case 0xca => skipN(4); ("float", -1L)
          case 0xcb => skipN(8); ("float", -1L)
          case 0xcc => skipN(1); ("int", -1L)
          case 0xcd => skipN(2); ("int", -1L)
          case 0xce => skipN(4); ("int", -1L)
          case 0xcf => skipN(8); ("int", -1L)
          case 0xd0 => skipN(1); ("int", -1L)
          case 0xd1 => skipN(2); ("int", -1L)
          case 0xd2 => skipN(4); ("int", -1L)
          case 0xd3 => skipN(8); ("int", -1L)
          case x if x >= 0xd4 && x <= 0xd8 => // fixext 1/2/4/8/16
            u8(); skipN(1L << (x - 0xd4)); nExts += 1
            ("ext", 1L << (x - 0xd4))
          case 0xd9 => val n = beN(1); skipN(n); ("str", n)
          case 0xda => val n = beN(2); skipN(n); ("str", n)
          case 0xdb => val n = beN(4); skipN(n); ("str", n)
          case 0xdc => walkArray(beN(2))
          case 0xdd => walkArray(beN(4))
          case 0xde => walkMap(beN(2))
          case 0xdf => walkMap(beN(4))
          case _ => throw MFail()
        }
      }

      val (kind, len) = item(0)
      if (p != b.length) throw MFail()
      val items = kind match {
        case "array" | "map" => Some(len)
        case _ => None
      }
      Some(MpFacts(kind, items, nNodes, maxDepth, nExts))
    } catch {
      case _: MFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (synth)
  // ---------------------------------------------------------------

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def mapHead(n: Int): Writer = {
      if (n < 16) out.write(0x80 | n)
      else { out.write(0xde); out.write(n >> 8); out.write(n & 0xff) }
      this
    }
    def arrayHead(n: Int): Writer = {
      if (n < 16) out.write(0x90 | n)
      else { out.write(0xdc); out.write(n >> 8); out.write(n & 0xff) }
      this
    }
    def str(s: String): Writer = {
      val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bs.length < 32) out.write(0xa0 | bs.length)
      else { out.write(0xd9); out.write(bs.length) }
      out.write(bs)
      this
    }
    def int(v: Long): Writer = {
      if (v >= 0 && v < 128) out.write(v.toInt)
      else if (v >= -32 && v < 0) out.write(0xe0 | (v + 32).toInt)
      else {
        out.write(0xd3)
        var i = 7
        while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      this
    }
    def bool(v: Boolean): Writer = {
      out.write(if (v) 0xc3 else 0xc2); this
    }
    def nil(): Writer = { out.write(0xc0); this }
    def fixext4(tpe: Int): Writer = {
      out.write(0xd6); out.write(tpe)
      (0 until 4).foreach(out.write)
      this
    }
    def result(): Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val mpSchema: StructType = StructType(Seq(
    StructField("top_kind", StringType),
    StructField("n_items", LongType),
    StructField("n_nodes", LongType),
    StructField("max_depth", IntegerType),
    StructField("n_exts", LongType)))

  def decodeMp(bytes: Array[Byte]): Seq[Any] =
    mpCensus(bytes) match {
      case Some(f) => Seq[Any](f.topKind,
        f.nItems.map(java.lang.Long.valueOf).orNull, f.nNodes,
        f.maxDepth, f.nExts)
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-doc synth: three planted shapes cycling on doc_id. */
  def synthMps(df: DataFrame, idCol: String, outCol: String)
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
        val w = new Writer
        java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => // map of n (str → int)
            val n = (id % 6 + 1).toInt
            w.mapHead(n)
            (0 until n).foreach(i => w.str(s"k$i").int(id + i))
          case 1 => // array of m [str, bool, nil]
            val m = (id % 4 + 1).toInt
            w.arrayHead(m)
            (0 until m).foreach { i =>
              w.arrayHead(3).str(s"v$i").bool(i % 2 == 0).nil()
            }
          case _ => // a timestamp-ish fixext inside a 1-map
            w.mapHead(1).str("ts").fixext4(-1 & 0xff)
        }
        Row.fromSeq(r.toSeq :+ w.result())
      }
    }(enc)
  }
}
