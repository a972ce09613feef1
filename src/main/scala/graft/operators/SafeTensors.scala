package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** SafeTensors triage (C230) — the format model weights ship in
  * today, designed precisely because pickles execute (C227
  * surfaces that fact). The layout is public (the huggingface
  * safetensors spec): a u64-LE header length, a JSON header mapping
  * tensor name → {dtype, shape, data_offsets:[begin,end)} plus an
  * optional `__metadata__` string map, then the raw tensor buffer.
  *
  * The triage validates what the reference loader validates — every
  * span in bounds, sizes equal to shape × itemsize, spans
  * non-overlapping and together covering the buffer exactly from 0
  * (no gaps, no slack) — and surfaces tensor/parameter/byte counts,
  * the dtype census, max rank and metadata presence. A file that
  * lies about any span REFUSES rather than half-decodes.
  *
  * Fixtures are hand-built from the spec (the HEIF/Matroska
  * precedent: no reference implementation ships in this
  * environment — probe recorded in README's round-15 inventory);
  * the writer round-trips and SafeTensorsSpec pins a
  * known-byte-layout literal.
  *
  * Totality: None on damage. Scale: header-only map work.
  */
object SafeTensors {

  private val MaxHeader = 16 << 20
  private val MaxTensors = 100000

  /** dtype → itemsize in bytes, from the spec's table. */
  val DtypeSizes: Map[String, Int] = Map(
    "F64" -> 8, "F32" -> 4, "F16" -> 2, "BF16" -> 2,
    "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1, "U8" -> 1,
    "U16" -> 2, "U32" -> 4, "U64" -> 8, "BOOL" -> 1,
    "F8_E4M3" -> 1, "F8_E5M2" -> 1)

  final case class StMeta(nTensors: Int, totalParams: Long,
      totalBytes: Long, dtypes: Seq[String], maxRank: Int,
      hasMetadata: Boolean)

  /** Parse + validate one safetensors blob. None on damage. */
  def stMeta(b: Array[Byte]): Option[StMeta] = {
    if (b == null || b.length < 8) return None
    var hlen = 0L
    var i = 0
    while (i < 8) { hlen |= (b(i) & 0xffL) << (8 * i); i += 1 }
    if (hlen <= 0 || hlen > MaxHeader || hlen > b.length - 8)
      return None
    val dataLen = b.length - 8 - hlen
    val json =
      try MiniJson.parse(new String(b, 8, hlen.toInt,
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Exception => return None }
    val obj = json match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => return None
    }
    val hasMeta = obj.contains("__metadata__")
    if (hasMeta && !obj("__metadata__").isInstanceOf[Map[_, _]])
      return None
    val tensors = obj.view.filterKeys(_ != "__metadata__").toSeq
    if (tensors.length > MaxTensors) return None
    var totalParams = 0L
    val dtypes = scala.collection.mutable.SortedSet[String]()
    var maxRank = 0
    val spans = Seq.newBuilder[(Long, Long)]
    tensors.foreach { case (_, v) =>
      val t = v match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return None
      }
      val dtype = t.get("dtype") match {
        case Some(s: String) => s
        case _ => return None
      }
      val itemSize = DtypeSizes.getOrElse(dtype, return None)
      val shape = t.get("shape") match {
        case Some(xs: Vector[_]) => xs.map {
          case d: Double
            if d >= 0 && d <= 1e15 && d == math.floor(d) => d.toLong
          case _ => return None
        }
        case _ => return None
      }
      val offs = t.get("data_offsets") match {
        case Some(Vector(a: Double, z: Double))
          if a >= 0 && z >= a && z <= dataLen &&
            a == math.floor(a) && z == math.floor(z) =>
          (a.toLong, z.toLong)
        case _ => return None
      }
      var n = 1L
      shape.foreach { d =>
        if (d == 0) n = 0
        else if (n > Long.MaxValue / d) return None
        else n *= d
      }
      if (offs._2 - offs._1 != n * itemSize) return None
      totalParams += n
      dtypes += dtype
      maxRank = math.max(maxRank, shape.length)
      spans += offs
    }
    // the reference loader demands the spans tile [0, dataLen)
    // exactly: sorted, gap-free, overlap-free
    val sorted = spans.result().sortBy(identity) // begin, then end
                                                 // (zero-len first)
    var at = 0L
    sorted.foreach { case (a, z) =>
      if (a != at) return None
      at = z
    }
    if (at != dataLen) return None
    Some(StMeta(tensors.length, totalParams, dataLen,
      dtypes.toSeq, maxRank, hasMeta))
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  /** Serialize tensors (name, dtype, shape) with zero-filled data
    * in given order; offsets assigned contiguously.
    */
  def stWrite(tensors: Seq[(String, String, Seq[Long])],
      metadata: Option[Map[String, String]] = None): Array[Byte] = {
    var at = 0L
    val entries = tensors.map { case (name, dtype, shape) =>
      val n = shape.product * DtypeSizes(dtype)
      val e = s""""$name":{"dtype":"$dtype","shape":[${
        shape.mkString(",")}],"data_offsets":[$at,${at + n}]}"""
      at += n
      e
    }
    val metaEntry = metadata.map { m =>
      s""""__metadata__":{${m.toSeq.sortBy(_._1).map {
        case (k, v) => s""""$k":"$v"""" }.mkString(",")}}"""
    }
    val header = (metaEntry.toSeq ++ entries).mkString("{", ",", "}")
    val hb = header.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](8 + hb.length + at.toInt)
    var i = 0
    while (i < 8) {
      out(i) = ((hb.length.toLong >> (8 * i)) & 0xff).toByte
      i += 1
    }
    System.arraycopy(hb, 0, out, 8, hb.length)
    out
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val stSchema: StructType = StructType(Seq(
    StructField("n_tensors", IntegerType),
    StructField("total_params", LongType),
    StructField("total_bytes", LongType),
    StructField("dtypes", StringType),
    StructField("max_rank", IntegerType),
    StructField("has_metadata", BooleanType)))

  def decodeSt(bytes: Array[Byte]): Seq[Any] =
    stMeta(bytes) match {
      case Some(m) => Seq[Any](m.nTensors, m.totalParams,
        m.totalBytes, m.dtypes.mkString(","), m.maxRank,
        m.hasMetadata)
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-doc synth: planted tensor manifests cycling on doc_id,
    * facts closed-form.
    */
  def synthSts(df: DataFrame, idCol: String, outCol: String)
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
        val bytes = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 =>
            // n layers of (weight F32 [d, 4], bias F16 [d])
            val n = (id % 4 + 1).toInt
            val d = (id % 5 + 2)
            stWrite((0 until n).flatMap(l => Seq(
              (s"layer$l.weight", "F32", Seq(d, 4L)),
              (s"layer$l.bias", "F16", Seq(d)))))
          case 1 =>
            stWrite(Seq(
              ("emb", "BF16", Seq(id % 7 + 2, 8L)),
              ("ids", "I64", Seq(id % 3 + 1))),
              Some(Map("format" -> "pt")))
          case _ =>
            // a scalar plus a zero-dim tensor
            stWrite(Seq(
              ("s", "F64", Seq.empty),
              ("z", "U8", Seq(0L, 4L)),
              ("m", "BOOL", Seq(id % 6 + 1))))
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
