package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC file (Feather v2) triage from raw bytes (C229) — the
  * interchange format ML pipelines pass between engines, and the
  * third columnar blob next to C218 parquet and C228 ORC. The
  * layout is public (the Arrow columnar spec): `ARROW1\0\0` magic,
  * then framed messages, and at the tail a FLATBUFFERS Footer
  * [schema + dictionary/record-batch block lists] followed by its
  * i32 length and the closing `ARROW1`.
  *
  * The flatbuffers walk is implemented from the public wire format
  * (root offset → vtable-indirected fields → strings/vectors/
  * structs) — ~60 lines, no library. Surfaced: metadata version,
  * field names and type labels (ints by width/sign, floats by
  * precision, dictionary encoding flagged), record-batch and
  * dictionary counts, and the EXACT total row count read from each
  * block's RecordBatch message header — compressed batches
  * included, since lengths live in the header, not the body.
  *
  * Pinning: fixtures written by pyarrow 16.1.0 itself
  * (`tools/arrow_pin.py`) across five schemas including nested,
  * dictionary-encoded and zstd-compressed layouts; ArrowSpec
  * replays pyarrow's recorded facts bit-exactly.
  *
  * Totality: None on damage; every flatbuffers dereference bounds-
  * checked. Scale: footer + per-block headers only — O(batches),
  * never the body bytes.
  */
object ArrowIpc {

  private val MaxFields = 10000
  private val MaxBlocks = 1 << 20
  private val MaxDepth = 16

  final case class ArrowMeta(version: Int, names: Seq[String],
      types: Seq[String], nBatches: Int, nDicts: Int, rows: Long)

  private final case class AFail() extends RuntimeException

  /** Bounds-checked little-endian reads over the whole file. */
  private final class Buf(val b: Array[Byte]) {
    val len: Int = b.length
    def u8(p: Int): Int = {
      if (p < 0 || p >= len) throw AFail()
      b(p) & 0xff
    }
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def i32(p: Int): Int = u16(p) | (u16(p + 2) << 16)
    def u32(p: Int): Long = i32(p) & 0xffffffffL
    def i64(p: Int): Long = u32(p) | (u32(p + 4) << 32)
  }

  // ---- minimal flatbuffers: tables, scalars, offsets, vectors ----

  /** Field slot file-offset inside table at `t`, or -1 if absent. */
  private def slot(bb: Buf, t: Int, id: Int): Int = {
    val vt = t - bb.i32(t)
    val vtSize = bb.u16(vt)
    val at = 4 + 2 * id
    if (at + 2 > vtSize) return -1
    val off = bb.u16(vt + at)
    if (off == 0) -1 else t + off
  }

  private def tableAt(bb: Buf, pos: Int): Int = {
    val t = pos + bb.u32(pos).toInt
    if (t < 0 || t + 4 > bb.len) throw AFail()
    t
  }

  private def indirect(bb: Buf, t: Int, id: Int): Int = {
    val s = slot(bb, t, id)
    if (s < 0) -1 else tableAt(bb, s)
  }

  private def str(bb: Buf, pos: Int): String = {
    val n = bb.u32(pos)
    if (n > 65536) throw AFail()
    val from = pos + 4
    if (from + n > bb.len) throw AFail()
    new String(bb.b, from, n.toInt,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** (element count, first element position) of a vector field. */
  private def vector(bb: Buf, t: Int, id: Int): (Int, Int) = {
    val s = slot(bb, t, id)
    if (s < 0) return (0, -1)
    val v = tableAt(bb, s)
    val n = bb.u32(v)
    if (n > MaxBlocks) throw AFail()
    (n.toInt, v + 4)
  }

  private def i16Field(bb: Buf, t: Int, id: Int, dflt: Int): Int = {
    val s = slot(bb, t, id)
    if (s < 0) dflt else (bb.u16(s) << 16) >> 16
  }

  private def u8Field(bb: Buf, t: Int, id: Int, dflt: Int): Int = {
    val s = slot(bb, t, id)
    if (s < 0) dflt else bb.u8(s)
  }

  private def i32Field(bb: Buf, t: Int, id: Int, dflt: Int): Int = {
    val s = slot(bb, t, id)
    if (s < 0) dflt else bb.i32(s)
  }

  private def boolField(bb: Buf, t: Int, id: Int): Boolean =
    u8Field(bb, t, id, 0) != 0

  // ---- Arrow schema.fbs unions/tables --------------------------

  /** Label one Field's type (type_type union + parameter tables). */
  private def typeLabel(bb: Buf, field: Int): String = {
    val tt = u8Field(bb, field, 2, 0)
    val tb = indirect(bb, field, 3)
    val base = tt match {
      case 1 => "null"
      case 2 => // Int: bitWidth (id 0), is_signed (id 1)
        val w = if (tb < 0) 0 else i32Field(bb, tb, 0, 0)
        val s = tb >= 0 && boolField(bb, tb, 1)
        (if (s) "int" else "uint") + w
      case 3 => // FloatingPoint: precision (id 0)
        i16Field(bb, if (tb < 0) field else tb, 0, 0) match {
          case 0 => "float16"
          case 1 => "float32"
          case _ => "float64"
        }
      case 4 => "binary"
      case 5 => "utf8"
      case 6 => "bool"
      case 7 => "decimal"
      case 8 => "date"
      case 9 => "time"
      case 10 => "timestamp"
      case 11 => "interval"
      case 12 => "list"
      case 13 => "struct"
      case 14 => "union"
      case 15 => "fixed_size_binary"
      case 16 => "fixed_size_list"
      case 17 => "map"
      case 18 => "duration"
      case 19 => "large_binary"
      case 20 => "large_utf8"
      case 21 => "large_list"
      case other => s"type$other"
    }
    // Field.dictionary (id 4) present → dictionary-encoded
    if (slot(bb, field, 4) >= 0) s"dict:$base" else base
  }

  /** Row count from the framed Message at a block offset: optional
    * 0xFFFFFFFF continuation, i32 metaLen, Message flatbuffer whose
    * header union (id 1/2) is a RecordBatch with length at id 0.
    */
  private def batchRows(bb: Buf, blockOff: Long): Long = {
    if (blockOff < 0 || blockOff + 8 > bb.len) throw AFail()
    val o = blockOff.toInt
    val (metaLen, fbAt) =
      if (bb.i32(o) == -1) (bb.i32(o + 4), o + 8)
      else (bb.i32(o), o + 4)
    if (metaLen <= 0 || fbAt + metaLen > bb.len) throw AFail()
    val msg = tableAt(bb, fbAt)
    val headerType = u8Field(bb, msg, 1, 0)
    if (headerType != 3) throw AFail() // not a RecordBatch
    val rb = indirect(bb, msg, 2)
    if (rb < 0) throw AFail()
    val s = slot(bb, rb, 0)
    if (s < 0) 0L else bb.i64(s)
  }

  /** Parse an Arrow IPC file. None on damage. */
  def arrowMeta(b: Array[Byte]): Option[ArrowMeta] = {
    if (b == null || b.length < 24) return None
    def magic(o: Int): Boolean =
      b(o) == 'A' && b(o + 1) == 'R' && b(o + 2) == 'R' &&
        b(o + 3) == 'O' && b(o + 4) == 'W' && b(o + 5) == '1'
    if (!magic(0) || b(6) != 0 || b(7) != 0) return None
    if (!magic(b.length - 6)) return None
    try {
      val bb = new Buf(b)
      val footerLen = bb.i32(b.length - 10)
      if (footerLen <= 0 || footerLen > b.length - 18) return None
      val footerStart = b.length - 10 - footerLen
      val footer = tableAt(bb, footerStart)
      val version = i16Field(bb, footer, 0, 0)
      val schema = indirect(bb, footer, 1)
      if (schema < 0) return None
      val (nFields, fieldsAt) = vector(bb, schema, 1)
      if (nFields > MaxFields) return None
      val names = Seq.newBuilder[String]
      val types = Seq.newBuilder[String]
      var i = 0
      while (i < nFields) {
        val f = tableAt(bb, fieldsAt + 4 * i)
        val nameSlot = slot(bb, f, 0)
        names += (if (nameSlot < 0) ""
          else str(bb, tableAt(bb, nameSlot)))
        types += typeLabel(bb, f)
        i += 1
      }
      // Block struct vectors: 24 bytes each (offset i64, metaLen
      // i32 + 4 pad, bodyLen i64)
      val (nDicts, _) = vector(bb, footer, 2)
      val (nBatches, batchesAt) = vector(bb, footer, 3)
      var rows = 0L
      var j = 0
      while (j < nBatches) {
        rows += batchRows(bb, bb.i64(batchesAt + 24 * j))
        j += 1
      }
      Some(ArrowMeta(version, names.result(), types.result(),
        nBatches, nDicts, rows))
    } catch {
      case _: AFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // Spark plumbing (fixtures are pyarrow-written; tools/arrow_pin.py)
  // ---------------------------------------------------------------

  val arrowSchema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("field_names", StringType),
    StructField("field_types", StringType),
    StructField("n_batches", IntegerType),
    StructField("n_dicts", IntegerType),
    StructField("total_rows", LongType)))

  def decodeArrow(bytes: Array[Byte]): Seq[Any] =
    arrowMeta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.names.mkString(","),
        m.types.mkString(","), m.nBatches, m.nDicts, m.rows)
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** The committed reference fixtures, loaded once per executor. */
  lazy val Fixtures: IndexedSeq[Array[Byte]] = {
    (0 until 5).map { i =>
      val in = getClass.getResourceAsStream(s"/arrow/fx$i.arrow")
      require(in != null, s"missing arrow fixture $i")
      try in.readAllBytes() finally in.close()
    }
  }

  /** Per-row fixture attach: doc_id % 5 selects the pyarrow-written
    * reference file (map-only).
    */
  def synthArrows(df: DataFrame, idCol: String, outCol: String)
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
