package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** GGUF triage (C231) — the single-file model format the llama.cpp
  * ecosystem distributes quantized LLMs in; model lakes fill up
  * with these next to safetensors (C230). The layout is public
  * (the ggml GGUF spec): `GGUF` magic, u32 version (v2/v3), u64
  * tensor and KV counts, a typed KV section (13 value types
  * including typed arrays), then per-tensor name / dims / ggml
  * quant type / offset records.
  *
  * Surfaced: version, tensor and KV counts, `general.architecture`
  * and `general.name`, the EXACT total parameter count (sum of dim
  * products), and the quant-type census across the public ggml
  * type table (F32…BF16, Q4_0…Q6_K, IQ* families) — what a model
  * lake filters on (architecture, size class, quantization).
  *
  * Fixtures are hand-built from the spec (the HEIF/Matroska
  * precedent — no reference GGUF implementation ships here); the
  * writer round-trips planted facts and GgufSpec pins a
  * known-byte-layout literal.
  *
  * Totality: None on damage; all counts/lengths bounded.
  * Scale: header-only map work — never touches tensor data.
  */
object Gguf {

  private val MaxKv = 100000
  private val MaxTensors = 1 << 20
  private val MaxStr = 1 << 20
  private val MaxArr = 1 << 20

  val TypeNames: Map[Int, String] = Map(
    0 -> "F32", 1 -> "F16", 2 -> "Q4_0", 3 -> "Q4_1",
    6 -> "Q5_0", 7 -> "Q5_1", 8 -> "Q8_0", 9 -> "Q8_1",
    10 -> "Q2_K", 11 -> "Q3_K", 12 -> "Q4_K", 13 -> "Q5_K",
    14 -> "Q6_K", 15 -> "Q8_K", 16 -> "IQ2_XXS", 17 -> "IQ2_XS",
    18 -> "IQ3_XXS", 19 -> "IQ1_S", 20 -> "IQ4_NL", 21 -> "IQ3_S",
    22 -> "IQ2_S", 23 -> "IQ4_XS", 24 -> "I8", 25 -> "I16",
    26 -> "I32", 27 -> "I64", 28 -> "F64", 29 -> "IQ1_M",
    30 -> "BF16")

  final case class GgufMeta(version: Int, nTensors: Long,
      nKv: Long, arch: String, name: String, totalParams: Long,
      qtypes: Seq[String])

  private final case class GFail() extends RuntimeException

  private final class Reader(val b: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= b.length) throw GFail()
      val v = b(p) & 0xff; p += 1; v
    }
    def u32(): Long = {
      var v = 0L; var i = 0
      while (i < 4) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def skip(n: Long): Unit = {
      if (n < 0 || n > b.length - p) throw GFail()
      p += n.toInt
    }
    def str(): String = {
      val n = u64()
      if (n < 0 || n > MaxStr || n > b.length - p) throw GFail()
      val s = new String(b, p, n.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      p += n.toInt
      s
    }
  }

  /** Byte width of fixed-size KV types; -1 for string/array. */
  private def kvWidth(t: Int): Int = t match {
    case 0 | 1 | 7 => 1
    case 2 | 3 => 2
    case 4 | 5 | 6 => 4
    case 10 | 11 | 12 => 8
    case _ => -1
  }

  /** Parse one GGUF header. None on damage. */
  def ggufMeta(b: Array[Byte]): Option[GgufMeta] = {
    if (b == null || b.length < 24) return None
    if (b(0) != 'G' || b(1) != 'G' || b(2) != 'U' || b(3) != 'F')
      return None
    try {
      val r = new Reader(b, 4)
      val version = r.u32().toInt
      if (version < 2 || version > 3) return None
      val nTensors = r.u64()
      val nKv = r.u64()
      if (nTensors < 0 || nTensors > MaxTensors || nKv < 0 ||
        nKv > MaxKv) return None
      var arch = ""
      var name = ""
      var i = 0L
      while (i < nKv) {
        val key = r.str()
        val t = r.u32().toInt
        t match {
          case 8 =>
            val v = r.str()
            if (key == "general.architecture") arch = v
            if (key == "general.name") name = v
          case 9 =>
            val et = r.u32().toInt
            val n = r.u64()
            if (n < 0 || n > MaxArr) throw GFail()
            val w = kvWidth(et)
            if (w > 0) r.skip(n * w)
            else if (et == 8) {
              var j = 0L
              while (j < n) { r.str(); j += 1 }
            } else throw GFail() // nested arrays are not legal
          case other =>
            val w = kvWidth(other)
            if (w < 0) throw GFail()
            r.skip(w.toLong)
        }
        i += 1
      }
      var totalParams = 0L
      val qtypes = scala.collection.mutable.SortedSet[String]()
      var j = 0L
      var lastOffset = -1L
      while (j < nTensors) {
        r.str() // tensor name
        val nDims = r.u32().toInt
        if (nDims < 0 || nDims > 8) throw GFail()
        var params = 1L
        var d = 0
        while (d < nDims) {
          val dim = r.u64()
          if (dim < 0 || dim > (1L << 50) ||
            (dim > 0 && params > Long.MaxValue / dim)) throw GFail()
          params *= dim
          d += 1
        }
        val qt = r.u32().toInt
        qtypes += TypeNames.getOrElse(qt, s"T$qt")
        val off = r.u64()
        if (off < lastOffset) throw GFail() // offsets non-decreasing
        lastOffset = off
        totalParams += params
        j += 1
      }
      Some(GgufMeta(version, nTensors, nKv, arch, name,
        totalParams, qtypes.toSeq))
    } catch {
      case _: GFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Writer = {
      var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def u64(v: Long): Writer = {
      var i = 0
      while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def str(s: String): Writer = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u64(b.length.toLong)
      out.write(b)
      this
    }
    def raw(b: Array[Byte]): Writer = { out.write(b); this }
    def result(): Array[Byte] = out.toByteArray
  }

  /** A v3 GGUF with planted arch/name KVs and tensors. */
  def ggufWrite(arch: String, name: String,
      extraKvs: Int, tensors: Seq[(String, Seq[Long], Int)])
      : Array[Byte] = {
    val w = new Writer
    w.raw("GGUF".getBytes("US-ASCII"))
    w.u32(3L)
    w.u64(tensors.length.toLong)
    w.u64(2L + extraKvs)
    w.str("general.architecture").u32(8L).str(arch)
    w.str("general.name").u32(8L).str(name)
    (0 until extraKvs).foreach { k =>
      k % 3 match {
        case 0 => w.str(s"x.u32.$k").u32(4L).u32(k.toLong)
        case 1 => w.str(s"x.bool.$k").u32(7L).raw(Array[Byte](1))
        case _ => // array of i32
          w.str(s"x.arr.$k").u32(9L).u32(5L).u64(3L)
            .u32(1L).u32(2L).u32(3L)
      }
    }
    var off = 0L
    tensors.foreach { case (tn, dims, qt) =>
      w.str(tn)
      w.u32(dims.length.toLong)
      dims.foreach(d => w.u64(d))
      w.u32(qt.toLong)
      w.u64(off)
      off += 64 // placeholder-aligned
    }
    w.result()
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val ggufSchema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("n_tensors", LongType),
    StructField("n_kv", LongType),
    StructField("arch", StringType),
    StructField("model_name", StringType),
    StructField("total_params", LongType),
    StructField("qtypes", StringType)))

  def decodeGguf(bytes: Array[Byte]): Seq[Any] =
    ggufMeta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.nTensors, m.nKv,
        m.arch, m.name, m.totalParams, m.qtypes.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-doc synth: planted architectures/quants cycling. */
  def synthGgufs(df: DataFrame, idCol: String, outCol: String)
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
        val arch = java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => "llama"
          case 1 => "gptneox"
          case _ => "qwen2"
        }
        val nLayers = (id % 4 + 1).toInt
        val d = id % 6 + 2
        val qt = java.lang.Math.floorMod(id, 4L).toInt match {
          case 0 => 0 // F32
          case 1 => 8 // Q8_0
          case 2 => 12 // Q4_K
          case _ => 30 // BF16
        }
        val tensors = (0 until nLayers).flatMap { l => Seq(
          (s"blk.$l.attn.weight", Seq(d, 16L), qt),
          (s"blk.$l.ffn.weight", Seq(d, 8L, 2L), qt))
        }
        val bytes = ggufWrite(arch, s"model-${id % 10}",
          (id % 3).toInt, tensors)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
