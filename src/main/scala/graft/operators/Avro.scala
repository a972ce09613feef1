package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** Avro object-container file reading (the public Avro 1.x spec) —
  * the de-facto interchange format of data-engineering pipelines;
  * a corpus of exported datasets carries .avro the way it carries
  * CSV, and each file is self-describing (schema in the header).
  *
  * The reference repo reads CSV only
  * (`/root/reference/src/trousse/dataset.py:341`). From-scratch, no
  * Avro library:
  *
  *  - Header: `Obj` magic, the file-metadata MAP (zigzag
  *    block counts — negative means a byte-size follows per spec —
  *    string keys, bytes values) carrying `avro.schema` (JSON, via
  *    the in-house parser) and `avro.codec`, then the 16-byte sync
  *    marker.
  *  - Blocks: zigzag record count + zigzag byte size + payload +
  *    sync, the sync VERIFIED against the header's on every block
  *    (a mismatch means a torn file — refuse, never misaligned
  *    records). Codecs: `null` and `deflate` (raw zlib per spec);
  *    `snappy`/`zstandard` refuse honestly.
  *  - Records: flat record schemas over the primitives — null,
  *    boolean, int, long (zigzag varints), float/double (LE IEEE),
  *    bytes/string (length-prefixed), and the nullable idiom
  *    `["null", T]` (zigzag branch index). Nested records, arrays,
  *    maps, enums, fixed → refuse: a half-decoded complex schema
  *    would silently drop data.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Avro {

  private object AvroFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxBytes = 64 << 20
  private val MaxRecords = 1 << 22

  /** A field: name + type tag ('n' null, 'b' boolean, 'i' int,
    * 'l' long, 'f' float, 'd' double, 's' string, 'y' bytes;
    * nullable flag for the `["null", T]` union idiom).
    */
  final case class AvroField(name: String, tag: Char,
      nullable: Boolean)
  final case class AvroDoc(fields: Seq[AvroField],
      rows: Seq[IndexedSeq[Any]], codec: String, nBlocks: Int)

  private final class Cur(val b: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= b.length) throw AvroFail
      val v = b(p) & 0xff
      p += 1
      v
    }
    /** Avro long: zigzag varint, little-endian 7-bit groups. */
    def zlong(): Long = {
      var shift = 0
      var acc = 0L
      var i = 0
      while (i < 10) {
        val c = u8()
        acc |= (c & 0x7fL) << shift
        if ((c & 0x80) == 0) {
          return (acc >>> 1) ^ -(acc & 1)
        }
        shift += 7
        i += 1
      }
      throw AvroFail
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || n > MaxBytes || p + n > b.length) throw AvroFail
      val out = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      out
    }
    def atEnd: Boolean = p >= b.length
  }

  private def parseSchema(json: String): Seq[AvroField] = {
    val root = MiniJson.parse(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw AvroFail
    }
    if (root.getOrElse("type", "") != "record") throw AvroFail
    val fields = root.get("fields") match {
      case Some(a: Vector[_]) => a
      case _ => throw AvroFail
    }
    fields.map {
      case f: Map[_, _] =>
        val fm = f.asInstanceOf[Map[String, Any]]
        val name = fm.getOrElse("name", "") match {
          case s: String if s.nonEmpty => s
          case _ => throw AvroFail
        }
        def tagOf(t: Any): Char = t match {
          case "null" => 'n'
          case "boolean" => 'b'
          case "int" => 'i'
          case "long" => 'l'
          case "float" => 'f'
          case "double" => 'd'
          case "string" => 's'
          case "bytes" => 'y'
          case _ => throw AvroFail // complex types refuse
        }
        fm.getOrElse("type", null) match {
          case u: Vector[_] =>
            // only the ["null", T] nullable idiom
            if (u.length != 2 || u(0) != "null") throw AvroFail
            AvroField(name, tagOf(u(1)), nullable = true)
          case t => AvroField(name, tagOf(t), nullable = false)
        }
      case _ => throw AvroFail
    }
  }

  private def inflateRaw(d: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // raw per the spec
    try {
      inf.setInput(d)
      val out = new java.io.ByteArrayOutputStream(d.length * 2)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case _: java.util.zip.DataFormatException =>
              throw AvroFail
          }
        if (n == 0 && inf.needsInput()) throw AvroFail
        out.write(buf, 0, n)
        if (out.size() > MaxBytes) throw AvroFail
      }
      out.toByteArray
    } finally inf.end()
  }

  private def readValue(c: Cur, tag: Char): Any = tag match {
    case 'n' => null
    case 'b' => c.u8() match {
      case 0 => java.lang.Boolean.FALSE
      case 1 => java.lang.Boolean.TRUE
      case _ => throw AvroFail
    }
    case 'i' | 'l' => c.zlong()
    case 'f' =>
      val raw = c.bytes(4)
      java.lang.Float.intBitsToFloat(
        (raw(0) & 0xff) | ((raw(1) & 0xff) << 8) |
          ((raw(2) & 0xff) << 16) | ((raw(3) & 0xff) << 24))
        .toDouble
    case 'd' =>
      val raw = c.bytes(8)
      var bits = 0L
      for (i <- 7 to 0 by -1) bits = (bits << 8) | (raw(i) & 0xffL)
      java.lang.Double.longBitsToDouble(bits)
    case 's' =>
      new String(c.bytes(c.zlong().toInt), StandardCharsets.UTF_8)
    case 'y' => c.bytes(c.zlong().toInt)
    case _ => throw AvroFail
  }

  /** Parse a container file. None on a bad magic, complex schemas,
    * unsupported codecs, sync mismatches, or torn blocks.
    */
  def avroRead(b: Array[Byte]): Option[AvroDoc] = {
    if (b == null || b.length < 32) return None
    try {
      if (b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1)
        return None
      val c = new Cur(b, 4)
      var schemaJson: String = null
      var codec = "null"
      // file metadata map: blocks until a 0 count
      var n = c.zlong()
      while (n != 0) {
        val count = if (n < 0) { c.zlong(); -n } else n
        var i = 0L
        while (i < count) {
          val key = new String(c.bytes(c.zlong().toInt),
            StandardCharsets.UTF_8)
          val value = c.bytes(c.zlong().toInt)
          key match {
            case "avro.schema" =>
              schemaJson = new String(value, StandardCharsets.UTF_8)
            case "avro.codec" =>
              codec = new String(value, StandardCharsets.UTF_8)
            case _ => ()
          }
          i += 1
        }
        n = c.zlong()
      }
      if (schemaJson == null) throw AvroFail
      val fields =
        try parseSchema(schemaJson)
        catch {
          case _: graft.core.MalformedSidecarException =>
            throw AvroFail
        }
      codec match {
        case "null" | "deflate" => ()
        case _ => throw AvroFail // snappy/zstandard: not verified here
      }
      val sync = c.bytes(16)
      val rows = scala.collection.mutable
        .ArrayBuffer[IndexedSeq[Any]]()
      var nBlocks = 0
      while (!c.atEnd) {
        val count = c.zlong()
        if (count < 0 || count > MaxRecords) throw AvroFail
        val size = c.zlong()
        if (size < 0 || size > MaxBytes) throw AvroFail
        val raw = c.bytes(size.toInt)
        val blockSync = c.bytes(16)
        if (!java.util.Arrays.equals(sync, blockSync))
          throw AvroFail
        val data = if (codec == "deflate") inflateRaw(raw) else raw
        val bc = new Cur(data, 0)
        var i = 0L
        while (i < count) {
          val vals = fields.map { f =>
            val tag =
              if (f.nullable) {
                bc.zlong() match {
                  case 0 => 'n'
                  case 1 => f.tag
                  case _ => throw AvroFail
                }
              } else f.tag
            readValue(bc, tag)
          }.toIndexedSeq
          rows += vals
          if (rows.length > MaxRecords) throw AvroFail
          i += 1
        }
        if (!bc.atEnd) throw AvroFail // trailing bytes = torn block
        nBlocks += 1
      }
      Some(AvroDoc(fields, rows.toSeq, codec, nBlocks))
    } catch {
      case AvroFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: OutOfMemoryError => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private def wZlong(v: Long): Array[Byte] = {
    var z = (v << 1) ^ (v >> 63)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    while ((z & ~0x7fL) != 0) {
      out += ((z & 0x7f) | 0x80).toByte
      z >>>= 7
    }
    out += (z & 0x7f).toByte
    out.toArray
  }

  private def wStr(s: String): Array[Byte] = {
    val u = s.getBytes(StandardCharsets.UTF_8)
    wZlong(u.length.toLong) ++ u
  }

  private val FixtureSchema =
    """{"type": "record", "name": "doc", "fields": [
      {"name": "id", "type": "long"},
      {"name": "body", "type": "string"},
      {"name": "flag", "type": "boolean"},
      {"name": "note", "type": ["null", "string"]}
    ]}"""

  /** A real container file over `(id long, body string, flag
    * boolean, note union[null,string])`: records split two-per-block
    * so multi-block reads and per-block sync checks exercise;
    * mode 0 `null` codec, mode 1 `deflate`.
    */
  def avroWrite(rows: Seq[(Long, String, Boolean, Option[String])],
      mode: Int): Array[Byte] = {
    val m = ((mode % 2) + 2) % 2
    val codec = if (m == 1) "deflate" else "null"
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    // metadata map: one block of two entries
    out.write(wZlong(2L), 0, wZlong(2L).length)
    def wr(a: Array[Byte]): Unit = out.write(a, 0, a.length)
    wr(wStr("avro.schema"))
    wr(wStr(FixtureSchema))
    wr(wStr("avro.codec"))
    wr(wStr(codec))
    wr(wZlong(0L))
    val sync = Array.tabulate[Byte](16)(i => (0x5a ^ i * 7).toByte)
    wr(sync)
    for (group <- rows.grouped(2)) {
      val block = new java.io.ByteArrayOutputStream()
      def wb(a: Array[Byte]): Unit = block.write(a, 0, a.length)
      for ((id, body, flag, note) <- group) {
        wb(wZlong(id))
        wb(wStr(body))
        wb(Array[Byte](if (flag) 1 else 0))
        note match {
          case Some(s) => wb(wZlong(1L)); wb(wStr(s))
          case None => wb(wZlong(0L))
        }
      }
      val rawBytes = block.toByteArray
      val payload =
        if (m == 1) {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(rawBytes); d.finish()
          val buf = new Array[Byte](rawBytes.length + 64)
          val n = d.deflate(buf)
          d.end()
          java.util.Arrays.copyOf(buf, n)
        } else rawBytes
      wr(wZlong(group.length.toLong))
      wr(wZlong(payload.length.toLong))
      wr(payload)
      wr(sync)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val avroSchema: StructType = StructType(Seq(
    StructField("avro_text", StringType),
    StructField("n_records", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("long_sum", LongType),
    StructField("n_null_notes", IntegerType)))

  /** Decode kernel: string fields concatenated in row-major order,
    * record/block census, exact long sums, null-note census.
    */
  def decodeAvro(bytes: Array[Byte]): Seq[Any] =
    avroRead(bytes) match {
      case Some(AvroDoc(fields, rows, _, nBlocks)) =>
        val sb = new java.lang.StringBuilder
        var lsum = 0L
        var nulls = 0
        rows.foreach { vals =>
          (fields zip vals).foreach {
            case (_, s: String) => sb.append(s)
            case (_, l: Long) => lsum += l
            case (f, null) if f.nullable => nulls += 1
            case _ => ()
          }
        }
        Seq[Any](sb.toString, rows.length, nBlocks, lsum, nulls)
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-row .avro synthesizer (map-only): the text split over
    * three records (two blocks), notes alternating null/present,
    * codec rotating on doc_id%2.
    */
  def synthAvro(df: DataFrame, idCol: String, textCol: String,
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
        val cut = {
          var c = text.length / 2
          if (c > 0 && c < text.length &&
            Character.isHighSurrogate(text.charAt(c - 1)) &&
            Character.isLowSurrogate(text.charAt(c))) c += 1
          c
        }
        val bytesOut = avroWrite(Seq(
          (id * 2 + 1, text.substring(0, cut), true, None),
          (id * 2 + 2, text.substring(cut), false,
            Some("note " + (id % 4))),
          (id * 2 + 3, "", true, None)), (id % 2).toInt)
        Row.fromSeq(r.toSeq :+ bytesOut)
      }
    }(enc)
  }
}
