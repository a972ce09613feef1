package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** TFRecord triage (C235) — THE classic training-data container:
  * billions of tf.Example rows ship in this framing. The layout is
  * public (TensorFlow's record-writer docs): per record a u64-LE
  * length, a u32-LE MASKED CRC32C of the length bytes, the data,
  * and a u32-LE masked CRC32C of the data, where
  * mask(c) = rotr15(c) + 0xa282ead8.
  *
  * The walk is strict the way TF's reader is strict: a bad length
  * CRC means the stream cannot even be advanced, so any CRC
  * failure REFUSES the whole blob rather than guessing at record
  * boundaries. Surfaced: record count, summed payload bytes,
  * max record size, and how many payloads parse as protobuf
  * messages (riding C217's census — tf.Example IS a protobuf).
  *
  * Pinning: CRC32C comes from the JDK's own
  * `java.util.zip.CRC32C` (RFC 3720 Castagnoli); TfRecordSpec pins
  * it against the public iSCSI check vector ("123456789" →
  * 0xE3069283) and the mask function against hand-computed values.
  *
  * Totality: None on damage. Scale: per-value map-only, one pass.
  */
object TfRecord {

  private val MaxRecords = 1 << 20
  private val MaxRecord = 64 << 20

  final case class TfFacts(nRecords: Long, dataBytes: Long,
      maxRecord: Long, nProto: Long)

  private def crc32c(b: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, from, len)
    c.getValue
  }

  /** TF's masked CRC: rotr15 then the magic additive constant. */
  def mask(crc: Long): Long = {
    val c = crc & 0xffffffffL
    (((c >>> 15) | (c << 17)) + 0xa282ead8L) & 0xffffffffL
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Walk one TFRecord blob. None on damage or any CRC failure. */
  def tfFacts(b: Array[Byte]): Option[TfFacts] = {
    if (b == null) return None
    try {
      var p = 0
      var n = 0L
      var dataBytes = 0L
      var maxRec = 0L
      var nProto = 0L
      while (p < b.length) {
        if (b.length - p < 12) return None
        val len = le64(b, p)
        if (len < 0 || len > MaxRecord || len > b.length - p - 16)
          return None
        if (le32(b, p + 8) != mask(crc32c(b, p, 8))) return None
        val dataAt = p + 12
        if (le32(b, dataAt + len.toInt) !=
          mask(crc32c(b, dataAt, len.toInt))) return None
        n += 1
        if (n > MaxRecords) return None
        dataBytes += len
        if (len > maxRec) maxRec = len
        val payload = java.util.Arrays.copyOfRange(b, dataAt,
          dataAt + len.toInt)
        if (Proto.protoCensus(payload).isDefined) nProto += 1
        p = dataAt + len.toInt + 4
      }
      if (n == 0) return None
      Some(TfFacts(n, dataBytes, maxRec, nProto))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Frame payloads in the TFRecord layout. */
  def tfWrite(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    payloads.foreach { d =>
      val lenB = new Array[Byte](8)
      var i = 0
      while (i < 8) {
        lenB(i) = ((d.length.toLong >> (8 * i)) & 0xff).toByte
        i += 1
      }
      out.write(lenB)
      w32(mask(crc32c(lenB, 0, 8)))
      out.write(d)
      w32(mask(crc32c(d, 0, d.length)))
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val tfSchema: StructType = StructType(Seq(
    StructField("n_records", LongType),
    StructField("data_bytes", LongType),
    StructField("max_record", LongType),
    StructField("n_proto", LongType)))

  def decodeTf(bytes: Array[Byte]): Seq[Any] =
    tfFacts(bytes) match {
      case Some(f) => Seq[Any](f.nRecords, f.dataBytes,
        f.maxRecord, f.nProto)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-doc synth: n framed records; even records are planted
    * protobuf messages (tf.Example-style), odd ones raw text that
    * cannot parse as proto (NUL-led, field 0 is never valid).
    */
  def synthTfs(df: DataFrame, idCol: String, outCol: String)
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
        val payloads = (0 until n).map { i =>
          if (i % 2 == 0) {
            // a tf.Example-style proto: fixed64 id + a 9-byte
            // string field = 20 bytes, constant for the oracle
            val w = new Proto.Writer
            w.fixed64(1, id + i)
            w.str(2, s"example-$i")
            w.result()
          } else {
            // NUL-led so it can never parse as proto (field 0)
            ("\u0000" + s"raw-$i-" + "x" * ((id % 7).toInt + 1))
              .getBytes("UTF-8")
          }
        }
        Row.fromSeq(r.toSeq :+ tfWrite(payloads))
      }
    }(enc)
  }
}
