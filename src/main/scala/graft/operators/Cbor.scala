package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** CBOR census (C232) — RFC 8949's binary JSON rides IoT dumps,
  * COSE/WebAuthn payloads and api caches into data lakes. Like the
  * pickle census (C227) this walks STRUCTURE, not values: major
  * types 0-7, all additional-info widths (immediate/8/16/32/64),
  * indefinite-length strings/arrays/maps with their break stops,
  * tags, and the float/simple family.
  *
  * Surfaced: the top-level kind, top container length, node count,
  * max nesting depth, tag count, indefinite-length presence, and
  * well-formedness in the RFC's strict sense — exactly one data
  * item, no trailing bytes, chunked strings only over matching
  * chunk types.
  *
  * Pinning: CborSpec replays RFC 8949 APPENDIX A test vectors —
  * the reference vectors published in the standard itself —
  * byte-for-byte from the document's hex column.
  *
  * Totality: None on damage; depth/node bounds. Scale: per-value
  * map-only, one linear pass.
  */
object Cbor {

  private val MaxNodes = 1 << 20
  private val MaxDepth = 64

  final case class CborFacts(topKind: String, nItems: Option[Long],
      nNodes: Long, maxDepth: Int, nTags: Long,
      hasIndefinite: Boolean)

  private final case class CFail() extends RuntimeException

  /** Census one CBOR data item; strict: no trailing bytes. */
  def cborCensus(b: Array[Byte]): Option[CborFacts] = {
    if (b == null || b.length == 0) return None
    try {
      var p = 0
      var nNodes = 0L
      var nTags = 0L
      var maxDepth = 0
      var hasIndef = false

      def u8(): Int = {
        if (p >= b.length) throw CFail()
        val v = b(p) & 0xff; p += 1; v
      }
      def uint(ai: Int): Long = ai match {
        case n if n < 24 => n.toLong
        case 24 => u8().toLong
        case 25 => (u8().toLong << 8) | u8()
        case 26 =>
          var v = 0L; var i = 0
          while (i < 4) { v = (v << 8) | u8(); i += 1 }
          v
        case 27 =>
          var v = 0L; var i = 0
          while (i < 8) { v = (v << 8) | u8(); i += 1 }
          v
        case _ => throw CFail()
      }
      def skipN(n: Long): Unit = {
        if (n < 0 || n > b.length - p) throw CFail()
        p += n.toInt
      }

      /** Walk one item; returns (majorType, container length). */
      def item(depth: Int): (Int, Long) = {
        if (depth > MaxDepth) throw CFail()
        nNodes += 1
        if (nNodes > MaxNodes) throw CFail()
        if (depth > maxDepth) maxDepth = depth
        val ib = u8()
        val mt = ib >>> 5
        val ai = ib & 0x1f
        mt match {
          case 0 | 1 => uint(ai); (mt, -1L)
          case 2 | 3 =>
            if (ai == 31) {
              // indefinite string: chunks of the SAME type, break
              hasIndef = true
              var len = 0L
              var done = false
              while (!done) {
                if (p >= b.length) throw CFail()
                val c = b(p) & 0xff
                if (c == 0xff) { p += 1; done = true }
                else {
                  if ((c >>> 5) != mt || (c & 0x1f) == 31)
                    throw CFail()
                  p += 1
                  val n = uint(c & 0x1f)
                  skipN(n)
                  len += n
                }
              }
              (mt, len)
            } else { val n = uint(ai); skipN(n); (mt, n) }
          case 4 | 5 =>
            val per = if (mt == 5) 2 else 1
            if (ai == 31) {
              hasIndef = true
              var count = 0L
              var done = false
              while (!done) {
                if (p >= b.length) throw CFail()
                if ((b(p) & 0xff) == 0xff) { p += 1; done = true }
                else {
                  var j = 0
                  while (j < per) { item(depth + 1); j += 1 }
                  count += 1
                }
              }
              (mt, count)
            } else {
              val n = uint(ai)
              if (n > MaxNodes) throw CFail()
              var i = 0L
              while (i < n) {
                var j = 0
                while (j < per) { item(depth + 1); j += 1 }
                i += 1
              }
              (mt, n)
            }
          case 6 =>
            uint(ai)
            nTags += 1
            item(depth + 1) // the tagged content
            (6, -1L)
          case _ => // 7: simple / float / break
            ai match {
              case 31 => throw CFail() // stray break
              case 24 =>
                val v = u8()
                if (v < 32) throw CFail() // RFC: two-byte simple <32
                (7, -1L)
              case 25 => skipN(2); (7, -1L)
              case 26 => skipN(4); (7, -1L)
              case 27 => skipN(8); (7, -1L)
              case _ => (7, -1L)
            }
        }
      }

      val (mt, len) = item(0)
      if (p != b.length) throw CFail() // trailing bytes
      val kind = mt match {
        case 0 => "uint"
        case 1 => "negint"
        case 2 => "bytes"
        case 3 => "text"
        case 4 => "array"
        case 5 => "map"
        case 6 => "tag"
        case _ => "simple"
      }
      Some(CborFacts(kind, if (len >= 0) Some(len) else None,
        nNodes, maxDepth, nTags, hasIndef))
    } catch {
      case _: CFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (synth): planted structures, canonical definite lengths
  // unless asked
  // ---------------------------------------------------------------

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    private def head(mt: Int, n: Long): Unit = {
      if (n < 24) out.write((mt << 5) | n.toInt)
      else if (n < 256) { out.write((mt << 5) | 24); out.write(n.toInt) }
      else if (n < 65536) {
        out.write((mt << 5) | 25)
        out.write((n >> 8).toInt); out.write((n & 0xff).toInt)
      } else {
        out.write((mt << 5) | 26)
        var i = 3
        while (i >= 0) { out.write(((n >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
    }
    def uint(v: Long): Writer = { head(0, v); this }
    def negint(v: Long): Writer = { head(1, -1 - v); this } // v<0
    def text(s: String): Writer = {
      val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      head(3, bs.length.toLong); out.write(bs); this
    }
    def bytes(n: Int): Writer = {
      head(2, n.toLong)
      (0 until n).foreach(i => out.write(i & 0xff))
      this
    }
    def arrayHead(n: Long): Writer = { head(4, n); this }
    def mapHead(n: Long): Writer = { head(5, n); this }
    def tag(t: Long): Writer = { head(6, t); this }
    def bool(v: Boolean): Writer = {
      out.write(if (v) 0xf5 else 0xf4); this
    }
    def indefArrayHead(): Writer = { out.write(0x9f); this }
    def break(): Writer = { out.write(0xff); this }
    def result(): Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val cborSchema: StructType = StructType(Seq(
    StructField("top_kind", StringType),
    StructField("n_items", LongType),
    StructField("n_nodes", LongType),
    StructField("max_depth", IntegerType),
    StructField("n_tags", LongType),
    StructField("has_indefinite", BooleanType)))

  def decodeCbor(bytes: Array[Byte]): Seq[Any] =
    cborCensus(bytes) match {
      case Some(f) => Seq[Any](f.topKind,
        f.nItems.map(java.lang.Long.valueOf).orNull, f.nNodes,
        f.maxDepth, f.nTags, f.hasIndefinite)
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-doc synth: four planted shapes cycling on doc_id. */
  def synthCbors(df: DataFrame, idCol: String, outCol: String)
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
        java.lang.Math.floorMod(id, 4L).toInt match {
          case 0 => // map of n (text → uint)
            val n = (id % 5 + 1).toInt
            w.mapHead(n.toLong)
            (0 until n).foreach { i =>
              w.text(s"k$i").uint(id + i)
            }
          case 1 => // array of m nested pairs [u, [neg, bool]]
            val m = (id % 4 + 1).toInt
            w.arrayHead(m.toLong)
            (0 until m).foreach { i =>
              w.arrayHead(2L).uint(i.toLong)
                .arrayHead(2L).negint(-1L - i).bool(i % 2 == 0)
            }
          case 2 => // tagged timestamp-ish text
            w.tag(0L).text(s"2026-01-${(id % 28 + 1)}")
          case _ => // indefinite array of k texts
            val k = (id % 3 + 1).toInt
            w.indefArrayHead()
            (0 until k).foreach(i => w.text(s"s$i"))
            w.break()
        }
        Row.fromSeq(r.toSeq :+ w.result())
      }
    }(enc)
  }
}
