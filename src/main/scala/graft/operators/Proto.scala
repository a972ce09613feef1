package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Schema-less protobuf wire-format triage (the public encoding
  * spec: varint keys `(field << 3) | wireType`, wire types 0
  * varint / 1 fixed64 / 5 fixed32 / 2 length-delimited, the
  * deprecated group pair 3/4). Binary blobs inside crawls and data
  * lakes are very often protobuf without a schema in reach; the
  * triage a pipeline needs is a FIELD CENSUS — which field numbers
  * exist, with what wire types, how often, how many payload bytes,
  * and whether a length-delimited field is itself a valid nested
  * message — without ever guessing semantics.
  *
  * `protoCensus` walks one message and returns per-(field, wire
  * type) rows with occurrence counts, payload byte totals, varint
  * sums (the only type-safe aggregate wire type 0 admits) and a
  * nested-parse flag (a field counts as nested only if EVERY
  * occurrence reparses cleanly — one binary blob that happens to
  * parse would poison schema inference downstream).
  *
  * There is no magic to sniff (documented refusal: random bytes
  * can parse as protobuf; classification belongs to the census
  * consumer, not the sniffer). Totality: None on torn varints,
  * lengths past the buffer, reserved wire types 6/7, or unmatched
  * group markers. Scale: per-value, map-only.
  */
object Proto {

  private val MaxFields = 100000
  private val MaxDepth = 16

  final case class FieldStat(field: Int, wireType: Int,
      count: Long, bytes: Long, varintSum: Long, nested: Boolean)

  private final case class PFail() extends RuntimeException

  private def varint(b: Array[Byte], p0: Int, end: Int)
      : (Long, Int) = {
    var v = 0L
    var p = p0
    var shift = 0
    while (true) {
      if (p >= end || shift > 63) throw PFail()
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return (v, p)
      shift += 7
    }
    (0L, p0) // unreachable
  }

  /** Validate that [from, until) parses as a complete message. */
  private def parses(b: Array[Byte], from: Int, until: Int,
      depth: Int): Boolean = {
    if (depth > MaxDepth) return false
    try {
      var p = from
      var groups = 0
      var n = 0
      while (p < until) {
        n += 1
        if (n > MaxFields) return false
        val (key, p1) = varint(b, p, until)
        val field = (key >>> 3).toInt
        val wt = (key & 7).toInt
        if (field <= 0 || field > 536870911) return false
        p = wt match {
          case 0 => varint(b, p1, until)._2
          case 1 => if (p1 + 8 > until) return false else p1 + 8
          case 5 => if (p1 + 4 > until) return false else p1 + 4
          case 2 =>
            val (len, p2) = varint(b, p1, until)
            if (len < 0 || len > until - p2) return false
            p2 + len.toInt
          case 3 => groups += 1; p1
          case 4 =>
            groups -= 1; if (groups < 0) return false else p1
          case _ => return false
        }
      }
      groups == 0 && n > 0
    } catch {
      case _: PFail => false
    }
  }

  /** Field census of one message. None unless the whole buffer is
    * a structurally valid message.
    */
  def protoCensus(b: Array[Byte]): Option[Seq[FieldStat]] = {
    if (b == null || b.length == 0) return None
    try {
      final case class Acc(var count: Long, var bytes: Long,
        var varintSum: Long, var allNested: Boolean)
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), Acc]
      var p = 0
      var groups = 0
      var n = 0
      while (p < b.length) {
        n += 1
        if (n > MaxFields) return None
        val (key, p1) = varint(b, p, b.length)
        val field = (key >>> 3).toInt
        val wt = (key & 7).toInt
        if (field <= 0 || field > 536870911) return None
        val a = acc.getOrElseUpdate((field, wt),
          Acc(0, 0, 0, wt == 2))
        a.count += 1
        p = wt match {
          case 0 =>
            val (v, p2) = varint(b, p1, b.length)
            a.varintSum += v
            a.bytes += p2 - p1
            p2
          case 1 =>
            if (p1 + 8 > b.length) return None
            a.bytes += 8; p1 + 8
          case 5 =>
            if (p1 + 4 > b.length) return None
            a.bytes += 4; p1 + 4
          case 2 =>
            val (len, p2) = varint(b, p1, b.length)
            if (len < 0 || len > b.length - p2) return None
            a.bytes += len
            a.allNested &&= len > 0 &&
              parses(b, p2, p2 + len.toInt, 1)
            p2 + len.toInt
          case 3 => groups += 1; p1
          case 4 =>
            groups -= 1; if (groups < 0) return None else p1
          case _ => return None
        }
      }
      if (groups != 0 || acc.isEmpty) return None
      Some(acc.iterator.map { case ((f, w), a) =>
        FieldStat(f, w, a.count, a.bytes, a.varintSum,
          w == 2 && a.allNested)
      }.toSeq)
    } catch {
      case _: PFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varintBytes(v: Long): Unit = {
      var x = v
      do {
        val part = (x & 0x7f).toInt
        x >>>= 7
        out.write(if (x != 0) part | 0x80 else part)
      } while (x != 0)
    }
    def key(field: Int, wt: Int): Unit =
      varintBytes((field.toLong << 3) | wt)
    def int(field: Int, v: Long): Unit = { key(field, 0)
      varintBytes(v) }
    def fixed64(field: Int, v: Long): Unit = {
      key(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt)
        i += 1 }
    }
    def fixed32(field: Int, v: Int): Unit = {
      key(field, 5)
      var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt)
        i += 1 }
    }
    def bytes(field: Int, d: Array[Byte]): Unit = {
      key(field, 2); varintBytes(d.length.toLong)
      out.write(d, 0, d.length)
    }
    def str(field: Int, s: String): Unit =
      bytes(field, s.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    def message(field: Int)(body: Writer => Unit): Unit = {
      val w = new Writer()
      body(w)
      bytes(field, w.result())
    }
    def result(): Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val censusSchema: StructType = StructType(Seq(
    StructField("field_no", IntegerType),
    StructField("wire_type", IntegerType),
    StructField("n_occ", LongType),
    StructField("n_bytes", LongType),
    StructField("varint_sum", LongType),
    StructField("nested", BooleanType)))

  /** Per-row synth: a message with planted fields — id varint,
    * text, `n` repeated varints, a nested message, a fixed64.
    */
  def synthProtos(df: DataFrame, idCol: String, textCol: String,
      nCol: String, outCol: String): DataFrame = {
    val (ii, ti, ni) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val text = Option(r.getString(ti)).getOrElse("")
        val nReps = r.getInt(ni)
        val w = new Writer()
        w.int(1, id)
        // NUL prefix: field number 0 is invalid, so this payload
        // can never accidentally reparse as a nested message — the
        // nested flag stays a deterministic oracle column
        w.str(2, "\u0000" + text)
        var j = 0
        while (j < nReps) { w.int(3, id + j); j += 1 }
        w.message(4) { m =>
          m.fixed32(1, (id & 0x7fffffff).toInt)
          m.str(2, s"nested-$id")
        }
        w.fixed64(5, id * 3)
        Row.fromSeq(r.toSeq :+ w.result())
      }
    }(enc)
  }

  /** One census row per (field, wire type) of each message. */
  def protoCensusRows(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val (ii, ci) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(contentCol))
    val schema = StructType(df.schema.fields(ii) +:
      censusSchema.fields.toSeq)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.get(ii)
        protoCensus(r.getAs[Array[Byte]](ci)).toSeq.flatten.map(s =>
          Row(id, s.field, s.wireType, s.count, s.bytes,
            s.varintSum, s.nested))
      }
    }(enc)
  }
}
