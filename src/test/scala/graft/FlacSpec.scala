package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.operators.{Flac, Multimodal}

/** FLAC codec: exact PCM round-trip through every subframe coding
  * and stereo decorrelation, cross-container signature equality with
  * WAV (the property that lets audioDupPairs pair a WAV original
  * with its FLAC re-encode), CRC enforcement, malformed
  * classification.
  */
class FlacSpec extends SparkSpec {
  import spark.implicits._

  /** The planted-LCG samples the audio fixtures share. */
  private def lcg(id: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (((id * 7919 + i.toLong * 104729) % 65536).toInt - 32768))

  /** Minimal PCM16 WAV around interleaved samples. */
  private def wav(samples: Array[Int], ch: Int, rate: Int)
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen)
      .put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("every subframe variant x stereo mode round-trips exactly") {
    for (v <- 0 until 5; m <- 0 until 4; ch <- Seq(1, 2)) {
      val samples = lcg(7, 2 * 137) // not a blocksize multiple
      val enc = Flac.encode(samples, ch, 22050L, v, m, blockSize = 64)
      val got = Flac.decodePcm16(enc)
      assert(got.isDefined, s"v=$v m=$m ch=$ch")
      val (pcm, gch, grate) = got.get
      assert(gch == ch && grate == 22050L, s"v=$v m=$m ch=$ch")
      assert(pcm.sameElements(samples), s"v=$v m=$m ch=$ch")
    }
  }

  test("constant and tiny streams round-trip") {
    val const = Array.fill(200)(-1234)
    val enc = Flac.encode(const, 2, 8000L, 1, 3, blockSize = 64)
    assert(Flac.decodePcm16(enc).get._1.sameElements(const))
    val tiny = Array(5, -5, 100) // single sub-blocksize frame
    val enc2 = Flac.encode(tiny, 1, 8000L, 2, 0, blockSize = 64)
    assert(Flac.decodePcm16(enc2).get._1.sameElements(tiny))
    assert(Flac.decodePcm16(
      Flac.encode(Array.emptyIntArray, 1, 8000L, 0, 0, 64))
      .get._1.isEmpty)
  }

  test("wav and flac of the same samples sign identically") {
    for (id <- Seq(3L, 17L, 40L); ch <- Seq(1, 2)) {
      val samples = lcg(id, ch * (id.toInt % 100 + 1))
      val w = wav(samples, ch, 16000)
      val f = Flac.encode(samples, ch, 16000L, (id % 5).toInt,
        (id % 4).toInt, blockSize = 64)
      val ws = Multimodal.wavAudioSignature(w)
      val fs = Flac.flacAudioSignature(f)
      assert(ws.isDefined && ws == fs, s"id=$id ch=$ch")
      // and the container-agnostic dispatch agrees with both
      assert(Flac.audioSignatureAny(w) == ws)
      assert(Flac.audioSignatureAny(f) == ws)
    }
  }

  test("audioDupPairs pairs a wav original with its flac re-encode") {
    val samples = lcg(9L, 180)
    val rows = Seq(
      (1L, wav(samples, 2, 16000)),
      (2L, Flac.encode(samples, 2, 16000L, 3, 3, 64)),
      (3L, wav(lcg(99L, 180), 2, 16000))) // unrelated audio
    val df = rows.toDF("doc_id", "content")
    val sigs = Multimodal.decodeBatches(df, "content",
      Flac.flacSignatureSchema)(Flac.decodeAudioSignatureAny)
      .select(col("doc_id"), col("audio_sig"))
    val pairs = Multimodal.audioDupPairs(sigs, "doc_id", "audio_sig")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("crc damage and truncation classify as None") {
    val samples = lcg(5L, 256)
    val enc = Flac.encode(samples, 2, 8000L, 1, 1, 64)
    assert(Flac.decodePcm16(enc).isDefined)
    // flip one bit inside the first frame's residual
    val bad = enc.clone()
    bad(enc.length - 20) = (bad(enc.length - 20) ^ 0x10).toByte
    assert(Flac.decodePcm16(bad).isEmpty)
    assert(Flac.decodePcm16(enc.dropRight(3)).isEmpty)
    assert(Flac.decodePcm16(enc.take(30)).isEmpty)
    assert(Flac.decodePcm16(null).isEmpty)
    assert(Flac.decodePcm16("fLaX1234".getBytes).isEmpty)
    // non-16-bit STREAMINFO (bps-1 rewritten to 7) refuses
    val b8 = enc.clone()
    b8(21) = ((b8(21) & 0x0f) | 0x70).toByte
    assert(Flac.decodePcm16(b8).isEmpty)
  }
}
