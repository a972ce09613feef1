package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "spark pipelines"))
    .toDF("doc_id", "text")

  test("mediaFromText produces the canonical (id, content, meta) schema") {
    val m = Multimodal.mediaFromText(docs, "doc_id", "text")
    assert(m.columns.toSeq == Seq("media_id", "content", "meta"))
    assert(m.schema("content").dataType.typeName == "binary")
    val r = m.filter(col("media_id") === 1L).select("meta.byte_len")
      .collect()(0).getLong(0)
    assert(r == "hello world".getBytes("UTF-8").length)
  }

  test("contentFeatures: deterministic content id") {
    val m = Multimodal.mediaFromText(docs, "doc_id", "text")
    val feats = Multimodal.contentFeatures(col("content"))
    val out = m.select(feats.map { case (n, c) => c.as(n) }: _*)
    val ids = out.select("content_id").as[String].collect()
    assert(ids.distinct.length == 2)
    assert(ids.forall(_.length == 64)) // sha-256 hex
  }

  test("decodeBatches appends decoder output columns per row") {
    val m = Multimodal.mediaFromText(docs, "doc_id", "text")
    val out = Multimodal.decodeBatches(m, "content",
      Multimodal.fakeDecodeSchema)(Multimodal.fakeDecode)
    assert(out.count() == 2)
    assert(out.columns.contains("dec_width"))
    assert(out.select("n_frames").as[Long].collect().forall(_ >= 1))
  }

  test("decodeBatches preserves source schema incl. nullability") {
    val m = Multimodal.mediaFromText(docs, "doc_id", "text")
    val out = Multimodal.decodeBatches(m, "content",
      Multimodal.fakeDecodeSchema)(Multimodal.fakeDecode)
    val expected = (m.schema.fields ++ Multimodal.fakeDecodeSchema.fields)
      .map(f => (f.name, f.dataType, f.nullable)).toSeq
    // the typed mapPartitions path must not re-derive nullability the
    // way the old df.rdd round-trip did
    assert(out.schema.fields
      .map(f => (f.name, f.dataType, f.nullable)).toSeq == expected)
  }

  test("resizeStub rewrites payload and metadata to the target size") {
    val m = Multimodal.mediaFromText(docs, "doc_id", "text")
    val out = Multimodal.resizeStub(m, "content", "meta", 8, 8)
    val r = out.filter(col("media_id") === 1L)
      .select("meta.width", "meta.height", "meta.byte_len", "content")
      .collect()(0)
    assert(r.getInt(0) == 8 && r.getInt(1) == 8)
    assert(r.getLong(2) <= 4) // 8*8/16 byte budget
    assert(r.getAs[Array[Byte]](3).length == r.getLong(2))
  }

  test("sampleFrames explodes every stride-th frame with byte slices") {
    val df = Seq((1L, Array.fill[Byte](32)(7))).toDF("id", "content")
    val out = Multimodal.sampleFrames(df, "content", frameBytes = 8,
      stride = 2)
    // 4 frames, stride 2 -> frame_idx 0 and 2
    assert(out.select("frame_idx").as[Int].collect().toSeq == Seq(0, 2))
    val fb = out.select("frame_bytes").as[Array[Byte]].collect()
    assert(fb.forall(_.length == 8))
  }
}
