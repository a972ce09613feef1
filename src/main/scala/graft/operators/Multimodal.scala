package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus the batch-UDF plumbing a
  * real decoder would plug into.
  *
  * The container has no image/audio codecs, so the DECODE KERNELS are
  * deterministic fakes (clearly marked). Everything Spark-side is real:
  * the schema contract, the per-partition batch iteration (the Scala
  * analog of `mapInPandas` — one Iterator[Row] per partition, streaming,
  * no per-row serialization boundary), the frame-sampling explode, and
  * the partitioning behavior.
  */
object Multimodal {

  /** Canonical media schema: (media_id, content: binary, meta struct). */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap any string column as a fake media asset: bytes = utf-8 of the
    * text (stand-in for real image bytes), metadata derived
    * deterministically from the content. This gives the pipeline a
    * binary column with honest Spark semantics to exercise.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val content = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).as("media_id"),
      content.as("content"),
      struct(
        lit("fake/img").as("format"),
        length(content).cast("long").as("byte_len"),
        (pmod(crc32(content), lit(1920)) + 1).cast("int").as("width"),
        (pmod(crc32(content), lit(1080)) + 1).cast("int").as("height"))
        .as("meta"))
  }

  /** Expression-level feature extraction from a binary column: byte
    * length, sha-256 content id, and a STUB perceptual signature (crc32
    * of the bytes — a real system would put pHash here; the Spark
    * plumbing is identical).
    */
  def contentFeatures(content: Column): Seq[(String, Column)] = Seq(
    "byte_len"   -> length(content).cast("long"),
    "content_id" -> sha2(content, 256),
    "phash_stub" -> crc32(content))

  /** Batch decode API — the Scala analog of `mapInPandas`: one lazy
    * iterator per partition, output schema declared up front, suitable
    * for wrapping any native decoder that amortizes setup per batch.
    * The decode kernel here is a deterministic fake (no codecs in the
    * container); swap `decodeStub` for a real implementation.
    *
    * Typed `Dataset.mapPartitions` with an explicit row encoder — NOT
    * `df.rdd`: the plan stays a single Dataset operator (no RDD
    * round-trip re-analyzing a hand-built frame) and the output schema
    * preserves the source fields' nullability instead of re-deriving it.
    */
  def decodeBatches(df: DataFrame, contentCol: String,
      outSchema: StructType)(
      decodeStub: Array[Byte] => Seq[Any]): DataFrame = {
    val idx    = df.schema.fieldIndex(contentCol)
    val schema = StructType(df.schema.fields ++ outSchema.fields)
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq ++ decodeStub(bytes))
      }
    }(enc)
  }

  /** Deterministic fake decoder: "resolution" and "n_frames" derived
    * from content bytes. STUB — replace with a real codec call.
    */
  def fakeDecode(bytes: Array[Byte]): Seq[Any] = {
    val h = java.util.Arrays.hashCode(bytes).toLong & 0x7fffffffL
    // Seq[Any] on purpose: a bare Seq(Int, Int, Long) numerically
    // widens every element to Long, breaking the declared IntegerType
    // fields at encode time.
    Seq[Any]((h % 1920 + 1).toInt, (h % 1080 + 1).toInt,
      (bytes.length / 16 + 1).toLong)
  }

  val fakeDecodeSchema: StructType = StructType(Seq(
    StructField("dec_width", IntegerType),
    StructField("dec_height", IntegerType),
    StructField("n_frames", LongType)))

  /** Resize plumbing: recompute the content payload and metadata for a
    * target resolution. The BYTE TRANSFORM IS A STUB (real systems
    * decode, scale, re-encode — no codecs in this container): payload
    * is deterministically truncated/kept to the target byte budget
    * (targetW·targetH/16). The Spark side is real: one projection,
    * binary in/binary out, metadata struct rebuilt alongside.
    */
  def resizeStub(df: DataFrame, contentCol: String, metaCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val budget  = math.max(targetW * targetH / 16, 1)
    val resized = col(contentCol)
      .substr(lit(1), least(length(col(contentCol)), lit(budget)))
    df.withColumn(contentCol, resized)
      .withColumn(metaCol, struct(
        col(s"$metaCol.format"),
        length(resized).cast("long").as("byte_len"),
        lit(targetW).as("width"),
        lit(targetH).as("height")))
  }

  /** Frame sampling: explode a media row into every `stride`-th frame,
    * slicing the byte payload per frame (real videos would seek; the
    * slicing/partitioning shape is the same). Output grows by the frame
    * count — the explode happens AFTER any filtering so only surviving
    * rows fan out.
    */
  def sampleFrames(df: DataFrame, contentCol: String, frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = greatest(
      (length(col(contentCol)) / frameBytes).cast("int"), lit(1))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1, lit(stride))))
      .withColumn("frame_bytes",
        col(contentCol).substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)))
  }
}
