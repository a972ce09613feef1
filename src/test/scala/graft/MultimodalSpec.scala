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

  // ---- real header codecs ----

  /** Minimal valid PNG: signature + IHDR with the given dims. */
  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(colorType.toByte) // bit depth, color type
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // comp/filter/interlace
    bb.putInt(0) // CRC, unvalidated
    bb.array()
  }

  /** Minimal JPEG: SOI, an APP0 segment to skip, fill byte, SOF0. */
  private def jpegBytes(w: Int, h: Int, comps: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 4 + 1 + 2 + 2 + 8)
    bb.put(0xff.toByte).put(0xd8.toByte)          // SOI
    bb.put(0xff.toByte).put(0xe0.toByte)          // APP0
    bb.putShort(6.toShort).putInt(0x4a464946)     // len 6, "JFIF"
    bb.put(0xff.toByte)                           // fill byte
    bb.put(0xff.toByte).put(0xc0.toByte)          // SOF0
    bb.putShort((8 + comps * 3).toShort)
    bb.put(8.toByte)                              // precision
    bb.putShort(h.toShort).putShort(w.toShort)
    bb.put(comps.toByte)
    bb.array().take(2 + 4 + 4 + 1 + 2 + 2 + 1 + 2 + 2 + 1)
  }

  test("pngDims: golden headers across color types; malformed -> None") {
    assert(Multimodal.pngDims(pngBytes(640, 480, 2)) ==
      Some(Multimodal.ImageDims("png", 640, 480, 3)))
    assert(Multimodal.pngDims(pngBytes(1, 1, 0)) ==
      Some(Multimodal.ImageDims("png", 1, 1, 1)))
    assert(Multimodal.pngDims(pngBytes(1920, 1080, 6)) ==
      Some(Multimodal.ImageDims("png", 1920, 1080, 4)))
    assert(Multimodal.pngDims(pngBytes(33, 7, 4)) ==
      Some(Multimodal.ImageDims("png", 33, 7, 2)))
    // malformed: truncated, corrupt signature, bad color type, 0-dim
    assert(Multimodal.pngDims(pngBytes(640, 480, 2).take(20)).isEmpty)
    val badSig = pngBytes(640, 480, 2); badSig(0) = 0x42
    assert(Multimodal.pngDims(badSig).isEmpty)
    assert(Multimodal.pngDims(pngBytes(640, 480, 5)).isEmpty)
    assert(Multimodal.pngDims(pngBytes(0, 480, 2)).isEmpty)
    assert(Multimodal.pngDims("not an image".getBytes).isEmpty)
    assert(Multimodal.pngDims(null).isEmpty)
  }

  test("jpegDims: SOF behind skipped segments; malformed -> None") {
    assert(Multimodal.jpegDims(jpegBytes(800, 600, 3)) ==
      Some(Multimodal.ImageDims("jpeg", 800, 600, 3)))
    assert(Multimodal.jpegDims(jpegBytes(12, 34, 1)) ==
      Some(Multimodal.ImageDims("jpeg", 12, 34, 1)))
    // truncated before SOF payload, misaligned marker, bare SOI
    assert(Multimodal.jpegDims(jpegBytes(800, 600, 3).dropRight(4))
      .isEmpty)
    val bad = jpegBytes(800, 600, 3); bad(2) = 0x00
    assert(Multimodal.jpegDims(bad).isEmpty)
    assert(Multimodal.jpegDims(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
    assert(Multimodal.jpegDims("junk".getBytes).isEmpty)
  }

  /** Minimal valid WAV: RIFF/WAVE + fmt (16-byte PCM) + data chunk.
    * Optionally an extra LIST chunk before fmt to exercise skipping.
    */
  private def wavBytes(channels: Int, rate: Int, bits: Int,
      dataLen: Int, extraChunk: Boolean = false): Array[Byte] = {
    val extra = if (extraChunk) 8 + 4 else 0
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * (bits / 8)
    bb.put("RIFF".getBytes).putInt(36 + extra + dataLen)
      .put("WAVE".getBytes)
    if (extraChunk)
      bb.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataLen)
      .put(Array.fill[Byte](dataLen)(0))
    bb.array()
  }

  test("wavMeta: goldens incl. skipped chunks; malformed -> None") {
    assert(Multimodal.wavMeta(wavBytes(2, 44100, 16, 400)) ==
      Some(Multimodal.AudioMeta("wav", 2, 44100, 16, 100L)))
    assert(Multimodal.wavMeta(wavBytes(1, 8000, 8, 37)) ==
      Some(Multimodal.AudioMeta("wav", 1, 8000, 8, 37L)))
    // a LIST chunk before fmt must be skipped, not break the walk
    assert(Multimodal.wavMeta(wavBytes(2, 22050, 16, 8,
      extraChunk = true)) ==
      Some(Multimodal.AudioMeta("wav", 2, 22050, 16, 2L)))
    // malformed: truncated, wrong magic, no fmt/data, zero channels
    assert(Multimodal.wavMeta(wavBytes(2, 44100, 16, 400).take(30))
      .isEmpty)
    val bad = wavBytes(2, 44100, 16, 4); bad(9) = 'X'
    assert(Multimodal.wavMeta(bad).isEmpty)
    assert(Multimodal.wavMeta(wavBytes(0, 44100, 16, 4)).isEmpty)
    assert(Multimodal.wavMeta("RIFFxxxxWAVE but no chunks here padpad"
      .getBytes).isEmpty)
    assert(Multimodal.wavMeta(null).isEmpty)
    // data chunk declaring more payload than is present = truncated
    // file -> undecodable, NOT a frame count from the declared length
    assert(Multimodal.wavMeta(wavBytes(2, 44100, 16, 400).dropRight(10))
      .isEmpty)
  }

  /** PCM16 WAV with explicit samples (LE two's complement). */
  private def wavPcm(channels: Int, rate: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16.toShort)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("differenceHash64: gradient direction, strict-> ties, " +
      "brightness invariance") {
    // 9 columns ascending: every adjacent comparison > -> all 64 bits
    val w = 9; val h = 8
    def img(f: Int => Int) =
      Array.tabulate(w * h)(i => f(i % w))
    assert(Multimodal.differenceHash64(img(c => c * 10), w, h) == -1L)
    // descending -> no bits; flat -> no bits (strict >)
    assert(Multimodal.differenceHash64(img(c => 90 - c * 10), w, h)
      == 0L)
    assert(Multimodal.differenceHash64(img(_ => 77), w, h) == 0L)
    // alternating low/high: even-position bits per row = 0x55 pattern
    assert(Multimodal.differenceHash64(
      img(c => if (c % 2 == 0) 30 else 130), w, h)
      == 0x5555555555555555L)
    // global brightness shift leaves the dHash unchanged (the aHash
    // changes when the shift crosses cell means over the global mean)
    val base = img(c => c * 7 + 11)
    val brighter = base.map(_ + 40)
    assert(Multimodal.differenceHash64(base, w, h) ==
      Multimodal.differenceHash64(brighter, w, h))
    // end-to-end through the real PNG codec
    val png = Multimodal.pngEncodeGray(w, h, img(c => c * 10))
    assert(Multimodal.imageDHash(png).contains(-1L))
    assert(Multimodal.imageDHash("junk".getBytes).isEmpty)
  }

  test("wavPcm16Features: exact integer sums, thresholds inclusive") {
    val smp = Array[Short](0, 100, -32768, 32767, -327, 328, 32760,
      -5000)
    val f = Multimodal.wavPcm16Features(wavPcm(1, 8000, smp)).get
    val abs = smp.map(s => math.abs(s.toInt).toLong)
    assert(f.nSamples == 8L)
    assert(f.sumAbs == abs.sum)
    assert(f.sumSq == abs.map(a => a * a).sum)
    assert(f.peak == 32768) // |-32768| must not wrap
    assert(f.nSilence == 3L) // 0, 100, -327 (<= 327 inclusive)
    assert(f.nClipped == 3L) // -32768, 32767, 32760 (>= 32760)
    assert(f.durationUs == 1000L) // 8 frames / 8000 Hz
    // mono sign stream ≥0: [1,1,0,1,0,1,1,0] -> 5 boundary crossings
    assert(f.nZeroCross == 5L)
    // stereo: same samples = 4 frames; per-sample sums unchanged;
    // crossings count within each channel's own frame sequence:
    // ch0 [0,-32768,-327,32760] -> ≥0 [1,0,0,1] = 2
    // ch1 [100,32767,328,-5000] -> ≥0 [1,1,1,0] = 1
    val g = Multimodal.wavPcm16Features(wavPcm(2, 8000, smp)).get
    assert(g.nSamples == 8L && g.sumAbs == f.sumAbs &&
      g.durationUs == 500L)
    assert(g.nZeroCross == 3L)
    // empty data chunk: all-zero features, still decodable
    val e = Multimodal.wavPcm16Features(
      wavPcm(1, 44100, Array.empty[Short])).get
    assert(e == Multimodal.AudioFeatures(0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("exifOrientation: round-trips both byte orders, leaves " +
      "pixels decodable, malformed -> None") {
    val w = 16; val h = 16
    val pix = Array.tabulate(w * h)(i => 60 + (i % 7) * 20)
    val jpeg = Multimodal.jpegEncodeGray(w, h, pix)
    assert(Multimodal.exifOrientation(jpeg).isEmpty) // no APP1 yet
    for (o <- 1 to 8; be <- Seq(false, true)) {
      val tagged = Multimodal.withExifApp1(jpeg, o, be)
      assert(Multimodal.exifOrientation(tagged).contains(o),
        s"orientation $o bigEndian=$be")
      // the APP1 must not disturb the RAW pixel decode (imageAHash
      // now orientation-NORMALIZES on top — GifOrientationSpec pins
      // that; here we pin that the stored pixels are untouched)
      assert(Multimodal.imageDecodeLuma(tagged).get._3
        .sameElements(Multimodal.imageDecodeLuma(jpeg).get._3),
        s"orientation $o bigEndian=$be decode")
      // and the oriented hash equals applying the transform manually
      val (tw, th, tl) = Multimodal.applyOrientation(
        Multimodal.imageDecodeLuma(jpeg).get._3, w, h, o)
      assert(Multimodal.imageAHash(tagged)
        .contains(Multimodal.averageHash64(tl, tw, th)),
        s"orientation $o bigEndian=$be hash")
    }
    // T.81 fill bytes (extra 0xFF padding before a marker) must not
    // hide the APP1
    val tagged6 = Multimodal.withExifApp1(jpeg, 6, bigEndian = true)
    val filled = Array[Byte](tagged6(0), tagged6(1),
      0xff.toByte, 0xff.toByte) ++ tagged6.drop(2)
    assert(Multimodal.exifOrientation(filled).contains(6))
    // corrupt the TIFF byte-order marker: parse refuses, no guessing
    val bad = Multimodal.withExifApp1(jpeg, 6, bigEndian = false)
    bad(12) = 0x7f // the 'II'/'MM' marker's first byte
    assert(Multimodal.exifOrientation(bad).isEmpty)
    assert(Multimodal.exifOrientation("nope".getBytes).isEmpty)
    assert(Multimodal.exifOrientation(null).isEmpty)
  }

  test("wavAudioSignature: windowed levels match the documented " +
      "formula; silence and empty data sign as 0; malformed -> None") {
    // 30 mono samples, window w (2 samples each) at constant 100·w
    val smp = Array.tabulate[Short](30)(k => (100 * (k / 2)).toShort)
    val got = Multimodal.wavAudioSignature(wavPcm(1, 8000, smp)).get
    // independent reference from the documented formula
    val n = smp.length
    val sums = new Array[Long](15); val cnts = new Array[Long](15)
    for (k <- 0 until n) {
      val w = k * 15 / n
      sums(w) += math.abs(smp(k).toInt); cnts(w) += 1
    }
    val gMean = sums.sum / n
    var want = 0L
    for (w <- 0 until 15) {
      val lvl = if (cnts(w) == 0 || gMean == 0) 0L
        else math.min(15L, sums(w) / cnts(w) * 8 / gMean)
      want |= lvl << (4 * w)
    }
    assert(got == want && got != 0L)
    // flat loudness -> every level 8 exactly
    val flat = Array.fill[Short](30)(500)
    val f = Multimodal.wavAudioSignature(wavPcm(1, 8000, flat)).get
    assert((0 until 15).forall(w => ((f >> (4 * w)) & 0xf) == 8))
    // all-zero (silence) and empty payloads sign as 0, still Some
    assert(Multimodal.wavAudioSignature(
      wavPcm(1, 8000, Array.fill[Short](30)(0))).contains(0L))
    assert(Multimodal.wavAudioSignature(
      wavPcm(1, 44100, Array.empty[Short])).contains(0L))
    // malformed / non-PCM16 stays None (same gate as the features)
    assert(Multimodal.wavAudioSignature("RIFFjunk".getBytes).isEmpty)
  }

  test("wavPcm16Features: non-PCM16 / malformed classify as None") {
    // 8-bit payloads have no 16-bit samples to sum
    assert(Multimodal.wavPcm16Features(wavBytes(1, 8000, 8, 37))
      .isEmpty)
    // compressed audioFormat
    val comp = wavPcm(1, 8000, Array[Short](1, 2)); comp(20) = 2
    assert(Multimodal.wavPcm16Features(comp).isEmpty)
    // data length not a whole number of frames (stereo, 3 samples)
    assert(Multimodal.wavPcm16Features(
      wavPcm(2, 8000, Array[Short](1, 2, 3))).isEmpty)
    // truncated + null
    assert(Multimodal.wavPcm16Features(
      wavPcm(1, 8000, Array[Short](1, 2)).dropRight(1)).isEmpty)
    assert(Multimodal.wavPcm16Features(null).isEmpty)
  }

  test("PNG encode -> pixel decode round-trips exactly (Sub+Up rows)") {
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (63, 17))) {
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val png = Multimodal.pngEncodeGray(w, h, pix)
      // the header parser agrees with the encoder
      assert(Multimodal.pngDims(png) ==
        Some(Multimodal.ImageDims("png", w, h, 1)))
      val Some((dw, dh, luma)) = Multimodal.pngDecodeLuma(png)
      assert((dw, dh) == ((w, h)))
      assert(luma.toSeq == pix.toSeq)
    }
  }

  test("PNG decode handles RGB with every filter type incl. Paeth") {
    // hand-built 4x5 RGB PNG exercising filters 0..4, one per row
    val w = 4; val h = 5; val bpp = 3
    val rnd = new scala.util.Random(7)
    val pixels = Array.fill(h, w * bpp)(rnd.nextInt(256))
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(y) // filter type = row index: None,Sub,Up,Average,Paeth
      for (x <- 0 until w * bpp) {
        val v = pixels(y)(x)
        val a = if (x >= bpp) pixels(y)(x - bpp) else 0
        val b = if (y > 0) pixels(y - 1)(x) else 0
        val c = if (x >= bpp && y > 0) pixels(y - 1)(x - bpp) else 0
        val pred = y match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write((v - pred) & 0xff)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) idat.write(tmp, 0, d.deflate(tmp))
    d.end()
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes); crc.update(data)
      be(data.length) ++ t.getBytes ++ data ++ be(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // depth 8, color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", idat.toByteArray) ++ chunk("IEND", Array[Byte]())
    val Some((dw, dh, luma)) = Multimodal.pngDecodeLuma(png)
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val o = x * bpp
      val expect = (77 * pixels(y)(o) + 150 * pixels(y)(o + 1) +
        29 * pixels(y)(o + 2) + 128) >> 8
      assert(luma(y * w + x) == expect, s"pixel ($x,$y)")
    }
  }

  test("pngDecodeLuma: malformed inputs classify as undecodable") {
    val ok = Multimodal.pngEncodeGray(16, 16,
      Array.tabulate(256)(_ % 251))
    assert(Multimodal.pngDecodeLuma(ok).isDefined)
    // truncated IDAT (zlib stream cut short)
    assert(Multimodal.pngDecodeLuma(ok.dropRight(30)).isEmpty)
    // interlace flag set
    val il = ok.clone(); il(28) = 1
    assert(Multimodal.pngDecodeLuma(il).isEmpty)
    // 16-bit depth
    val d16 = ok.clone(); d16(24) = 16
    assert(Multimodal.pngDecodeLuma(d16).isEmpty)
    // palette color type (no PLTE support)
    val pal = ok.clone(); pal(25) = 3
    assert(Multimodal.pngDecodeLuma(pal).isEmpty)
    // declared-size bomb: must refuse before allocating
    val bomb = ok.clone()
    bomb(16) = 0x7f; bomb(17) = 0xff.toByte // width ~2^31
    assert(Multimodal.pngDecodeLuma(bomb).isEmpty)
    assert(Multimodal.pngDecodeLuma(null).isEmpty)
    assert(Multimodal.pngDecodeLuma("not a png at all".getBytes).isEmpty)
  }

  test("averageHash64: uniform -> all bits; checkerboard -> parity") {
    // uniform: every cell equals the mean -> all 64 bits set
    assert(Multimodal.averageHash64(Array.fill(64)(7), 8, 8) == -1L)
    // 8x8 checkerboard, dark on even parity: odd-parity bits set
    val pix = Array.tabulate(64)(i =>
      if (((i % 8) + (i / 8)) % 2 == 0) 10 else 200)
    assert(Multimodal.averageHash64(pix, 8, 8) == 6172840429334713770L)
    // inverted phase -> complement
    val inv = pix.map(v => if (v == 10) 200 else 10)
    assert(Multimodal.averageHash64(inv, 8, 8) == -6172840429334713771L)
  }

  test("synthPatternPng plants an arbitrary hash verbatim") {
    val pattern = 0x0123456789ABCDEFL & ~(1L << 63) | 1L
    val params = Seq((9L, 32, 40, 30, 220, pattern))
      .toDF("id", "__w", "__h", "__a", "__b", "__patt")
    val png = Multimodal.synthPatternPng(params, "__w", "__h", "__a",
      "__b", "__patt", "content")
    val got = Multimodal.decodeBatches(png, "content",
        Multimodal.aHashSchema)(Multimodal.decodeAHash)
      .select(col("ahash")).as[Long].collect()(0)
    assert(got == pattern)
  }

  test("imageDupPairs: banding finds exactly the brute-force pairs") {
    val h0 = 0x5555555555555555L
    val hashes = Seq(
      (1L, h0),
      (2L, h0 ^ 1L),                     // hamming 1 from 1
      (3L, h0 ^ ((1L << 0) | (1L << 17) | (1L << 35))), // 3 bits in
                                         // THREE different bands
      (4L, h0 ^ 0x0FL),                  // hamming 4: excluded vs 1
      (5L, 0x0123456789ABCDEFL)          // far from everything
    ).toDF("img_id", "ahash")
    val got = Multimodal.imageDupPairs(hashes, "img_id", "ahash",
        maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    // brute force over the 5 hashes
    val hs = Map(1L -> h0, 2L -> (h0 ^ 1L),
      3L -> (h0 ^ ((1L << 0) | (1L << 17) | (1L << 35))),
      4L -> (h0 ^ 0x0FL), 5L -> 0x0123456789ABCDEFL)
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(want.contains((1L, 3L, 3))) // the cross-band case is live
    assert(!want.exists { case (a, b, _) => (a, b) == ((1L, 4L)) })
  }

  test("synthCheckerPng -> decodeAHash matches the analytic hash") {
    val params = Seq((1L, 16, 24, 60, 180, 0), (2L, 56, 32, 50, 90, 1),
      (3L, 8, 8, 0, 255, 0))
      .toDF("id", "__w", "__h", "__a", "__b", "__p")
    val png = Multimodal.synthCheckerPng(params, "__w", "__h", "__a",
      "__b", "__p", "content")
    val got = Multimodal.decodeBatches(png, "content",
        Multimodal.aHashSchema)(Multimodal.decodeAHash)
      .select(col("id"), col("ahash")).as[(Long, Long)]
      .collect().toMap
    assert(got(1L) == 6172840429334713770L)  // phase 0: odd cells = B
    assert(got(2L) == -6172840429334713771L) // phase 1: complement
    assert(got(3L) == 6172840429334713770L)
  }

  test("decodeImageDims kernel: parsed rows and null-row for garbage") {
    val rows = Seq(
      (1L, pngBytes(320, 200, 2)),
      (2L, jpegBytes(64, 32, 3)),
      (3L, "garbage".getBytes)
    ).toDF("id", "content")
    val out = Multimodal.decodeBatches(rows, "content",
        Multimodal.imageDimsSchema)(Multimodal.decodeImageDims)
      .select("id", "format", "width", "height", "channels")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, Some("png"), Some(320), Some(200), Some(3)),
      (2L, Some("jpeg"), Some(64), Some(32), Some(3)),
      (3L, None, None, None, None)))
  }

  test("resizeLumaNearest: identity, downsample and upsample agree " +
      "with the floor-sampling reference") {
    def ref(luma: Array[Int], w: Int, h: Int, tw: Int, th: Int) =
      Array.tabulate(tw * th) { k =>
        val (x, y) = (k % tw, k / tw)
        luma((y.toLong * h / th).toInt * w + (x.toLong * w / tw).toInt)
      }
    val w = 13; val h = 7
    val src = Array.tabulate(w * h)(i => (i * 37) % 251)
    for ((tw, th) <- Seq((13, 7), (8, 8), (5, 3), (26, 14), (1, 1)))
      assert(Multimodal.resizeLumaNearest(src, w, h, tw, th).toSeq ==
        ref(src, w, h, tw, th).toSeq, s"$tw x $th")
    assert(Multimodal.resizeLumaNearest(src, w, h, w, h).toSeq ==
      src.toSeq)
  }

  test("pngResize round-trips: re-decoding the resized bytes yields " +
      "the resampled plane; garbage yields nulls") {
    val w = 20; val h = 12
    val pix = Array.tabulate(w * h)(i => (i * 31 + 5) % 256)
    val rows = Seq(
      (1L, Multimodal.pngEncodeGray(w, h, pix)),
      (2L, "not a png".getBytes)).toDF("id", "content")
    val out = Multimodal.pngResize(rows, "content", 6, 9)
      .select("id", "resized", "resized_width", "resized_height")
      .collect().sortBy(_.getLong(0))
    val ok = out(0)
    assert(ok.getInt(2) == 6 && ok.getInt(3) == 9)
    val back = Multimodal.pngDecodeLuma(ok.getAs[Array[Byte]](1)).get
    assert(back._1 == 6 && back._2 == 9)
    assert(back._3.toSeq ==
      Multimodal.resizeLumaNearest(pix, w, h, 6, 9).toSeq)
    val bad = out(1)
    assert(bad.isNullAt(1) && bad.isNullAt(2) && bad.isNullAt(3))
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

  // ----------------------------------------------------------- JPEG

  /** 64×64 plane whose 8×8 blocks follow a 64-bit pattern. */
  private def patternPix(pattern: Long, a: Int, b: Int): Array[Int] = {
    val pix = new Array[Int](64 * 64)
    for (y <- 0 until 64; x <- 0 until 64) {
      val bit = 8 * (y / 8) + (x / 8)
      pix(y * 64 + x) = if ((pattern >>> bit & 1L) != 0L) b else a
    }
    pix
  }

  test("JPEG encode -> decode round-trips uniform blocks EXACTLY " +
      "across gray / 4:4:4 / 4:2:0 / restart-marker layouts") {
    val pattern = 0x5a3cc3a5f00f1e87L
    val pix = patternPix(pattern, 40, 200)
    for (mode <- 0 to 2; ri <- Seq(0, 1, 3)) {
      val bytes = Multimodal.jpegEncodeGray(64, 64, pix, mode, ri)
      val dims = Multimodal.jpegDims(bytes)
      assert(dims.contains(Multimodal.ImageDims("jpeg", 64, 64,
        if (mode == 0) 1 else 3)), s"dims wrong for mode=$mode")
      val got = Multimodal.jpegDecodeLuma(bytes)
      assert(got.isDefined, s"undecodable at mode=$mode ri=$ri")
      val (w, h, luma) = got.get
      assert(w == 64 && h == 64)
      assert(luma.sameElements(pix),
        s"pixel mismatch at mode=$mode ri=$ri")
    }
  }

  test("JPEG decode reconstructs a pure high-frequency basis block " +
      "(ZRL path) and smooth gradients within quantization error") {
    // one (7,7) basis component per block: 62 zigzag zeros before the
    // final coefficient forces the ZRL (16-zero-run) symbols
    val basisPix = new Array[Int](64 * 64)
    def a(u: Int, x: Int): Double = {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = 128.0 + 400.0 * a(7, y % 8) * a(7, x % 8)
      basisPix(y * 64 + x) = math.round(v).toInt
    }
    val bBytes = Multimodal.jpegEncodeGray(64, 64, basisPix)
    val bGot = Multimodal.jpegDecodeLuma(bBytes)
    assert(bGot.isDefined)
    val bDiff = bGot.get._3.zip(basisPix).map {
      case (g, p) => math.abs(g - p) }.max
    assert(bDiff <= 2, s"basis-block max error $bDiff")

    // smooth diagonal gradient: many small AC terms, error bounded by
    // the flat quant step
    val gradPix = Array.tabulate(64 * 64) { i =>
      val y = i / 64; val x = i % 64
      math.min(255, 2 * ((x + y) / 2))
    }
    val gBytes = Multimodal.jpegEncodeGray(64, 64, gradPix)
    val gGot = Multimodal.jpegDecodeLuma(gBytes)
    assert(gGot.isDefined)
    val gDiff = gGot.get._3.zip(gradPix).map {
      case (g, p) => math.abs(g - p) }.max
    assert(gDiff <= 8, s"gradient max error $gDiff")
  }

  test("jpegDecodeLuma: malformed inputs classify as undecodable, " +
      "never throw") {
    val pix = patternPix(0x0123456789abcdefL, 60, 180)
    val good = Multimodal.jpegEncodeGray(64, 64, pix)
    assert(Multimodal.jpegDecodeLuma(good).isDefined)
    // progressive flag: patch SOF0 (FFC0) to SOF2 (FFC2)
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Multimodal.jpegDecodeLuma(prog).isEmpty)
    // truncation mid-entropy
    assert(Multimodal.jpegDecodeLuma(
      good.take(good.length / 2)).isEmpty)
    // a bare non-stuffed marker inside the entropy segment
    val sosEnd = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xda).get + 14
    val corrupt = good.clone()
    corrupt(sosEnd + 20) = 0xff.toByte
    corrupt(sosEnd + 21) = 0x23.toByte
    assert(Multimodal.jpegDecodeLuma(corrupt).isEmpty)
    // declared-size bomb: dims patched huge must refuse to allocate
    val bomb = good.clone()
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte
    assert(Multimodal.jpegDecodeLuma(bomb).isEmpty)
    // wrong format entirely
    assert(Multimodal.jpegDecodeLuma(
      Multimodal.pngEncodeGray(8, 8, Array.fill(64)(7))).isEmpty)
    assert(Multimodal.jpegDecodeLuma(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.jpegDecodeLuma(null).isEmpty)
  }

  test("mp4Meta walks real ISO-BMFF boxes: goldens, multi-track, " +
      "64-bit sizes, malformed -> None") {
    val b = Multimodal.mp4EncodeMeta("mp42", timescale = 1000,
      duration = 7500, tracks = Seq((640, 360)))
    assert(Multimodal.mp4Meta(b).contains(
      Multimodal.VideoMeta("mp4", "mp42", 640, 360, 7500, 1)))

    // audio-style track (0x0 dims) first: parser must keep walking to
    // the first VISUAL track and still count both
    val two = Multimodal.mp4EncodeMeta("isom", timescale = 90000,
      duration = 90000L * 61, tracks = Seq((0, 0), (1920, 1080)))
    assert(Multimodal.mp4Meta(two).contains(
      Multimodal.VideoMeta("mp4", "isom", 1920, 1080, 61000, 2)))

    // 64-bit largesize on mdat: splice an 8-byte header variant in
    val base = Multimodal.mp4EncodeMeta("avc1", 600, 1200,
      Seq((320, 240)), mdatLen = 0)
    val withLarge = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, base.length - 8) // drop the empty mdat box
      // size=1 + 'mdat' + 64-bit largesize covering a 4-byte payload
      out.write(Array[Byte](0, 0, 0, 1))
      "mdat".foreach(c => out.write(c.toInt))
      out.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 20))
      out.write(Array[Byte](9, 9, 9, 9))
      out.toByteArray
    }
    assert(Multimodal.mp4Meta(withLarge).contains(
      Multimodal.VideoMeta("mp4", "avc1", 320, 240, 2000, 1)))

    // malformed: truncation mid-moov, a lying box size, not-BMFF
    assert(Multimodal.mp4Meta(
      java.util.Arrays.copyOfRange(b, 0, 40)).isEmpty)
    val lying = b.clone()
    lying(0) = 0x7f.toByte // ftyp size far past the payload
    assert(Multimodal.mp4Meta(lying).isEmpty)
    assert(Multimodal.mp4Meta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(null).isEmpty)

    // kernel shape: parsed row and all-null row
    val rows = Seq((1L, b), (2L, "garbage".getBytes))
      .toDF("id", "content")
    val parsed = Multimodal.decodeBatches(rows, "content",
      Multimodal.videoMetaSchema)(Multimodal.decodeVideoMeta)
      .select("id", "brand", "width", "duration_ms")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(parsed(1L) == "mp42" && parsed(2L) == null)
  }

  test("mp4MjpegSamples + mp4FrameHashes: real sample-table frame " +
      "decode; non-MJPEG and malformed -> no rows / None") {
    val patterns = Seq(0x55aa55aa55aa55aaL, -1L, 0x0f0f0f0f0f0f0f0fL)
    val frames = patterns.map(p =>
      Multimodal.jpegEncodeGray(64, 64, patternPix(p, 40, 200)))
    val mp4 = Multimodal.mp4EncodeMjpeg(frames)

    // the sample table must resolve each frame's exact byte range
    val samples = Multimodal.mp4MjpegSamples(mp4).get
    assert(samples.length == 3)
    assert(samples.map(_.size) == frames.map(_.length))
    samples.zip(frames).foreach { case (smp, f) =>
      val sliced = java.util.Arrays.copyOfRange(mp4,
        smp.offset.toInt, smp.offset.toInt + smp.size)
      assert(sliced.sameElements(f))
    }
    // metadata walk still reads the same container
    assert(Multimodal.mp4Meta(mp4).exists(m =>
      m.width == 64 && m.nTracks == 1))

    // frame decode end-to-end: every planted pattern hash comes back
    val rows = Seq((7L, mp4)).toDF("id", "content")
    val hashed = Multimodal.mp4FrameHashes(rows, "id", "content")
      .select("id", "frame_idx", "ahash")
      .as[(Long, Int, Long)].collect().sortBy(_._2).toSeq
    assert(hashed == patterns.zipWithIndex.map {
      case (p, i) => (7L, i, p) })

    // co64 (64-bit chunk offsets, the >4 GB layout) + uniform stsz:
    // identical frames -> constant sample size, offsets still exact
    val same = Seq(frames.head, frames.head, frames.head)
    val wide = Multimodal.mp4EncodeMjpeg(same, wideOffsets = true,
      uniformSize = true)
    val wideSamples = Multimodal.mp4MjpegSamples(wide).get
    assert(wideSamples.map(_.size) == same.map(_.length))
    val wideHashes = Multimodal.mp4FrameHashes(
        Seq((3L, wide)).toDF("id", "content"), "id", "content")
      .select("ahash").as[Long].collect().toSeq
    assert(wideHashes == Seq.fill(3)(patterns.head))

    // a metadata-only mp4 (no MJPEG track) produces zero rows
    val plain = Multimodal.mp4EncodeMeta("isom", 1000, 1000,
      Seq((320, 240)))
    assert(Multimodal.mp4MjpegSamples(plain).isEmpty)
    val none = Multimodal.mp4FrameHashes(
      Seq((1L, plain)).toDF("id", "content"), "id", "content")
    assert(none.count() == 0)
    // truncated container: the lying sample range classifies as None
    assert(Multimodal.mp4MjpegSamples(
      java.util.Arrays.copyOfRange(mp4, 0, mp4.length / 2)).isEmpty)
    // a corrupted frame inside a valid table -> null hash, no throw
    val broken = mp4.clone()
    val s1 = samples(1)
    broken(s1.offset.toInt) = 0 // kill frame 1's SOI marker
    val partial = Multimodal.mp4FrameHashes(
        Seq((9L, broken)).toDF("id", "content"), "id", "content")
      .select("frame_idx", "ahash").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(partial(0).contains(patterns(0)) && partial(1).isEmpty &&
      partial(2).contains(patterns(2)))
  }

  test("progressive JPEG decodes to the SAME luma as a baseline " +
      "encoding of the same pixels (random content, gray/4:4:4/4:2:0)") {
    // both encoders share fdctQuant, so the decoded planes must be
    // bit-identical — this drives every progressive path: DC first +
    // refinement, AC first in two spectral bands, AC refinement with
    // newly-nonzero insertions, correction bits and EOB runs
    val rnd = new scala.util.Random(77)
    val cases = Seq(
      (0, 8, 8), (0, 24, 16), (0, 64, 64),
      (1, 8, 8), (1, 24, 16), (1, 64, 64),
      (2, 16, 16), (2, 32, 16), (2, 64, 64)) // 4:2:0: 16-aligned
    for ((mode, w, h) <- cases) {
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val base = Multimodal.jpegDecodeLuma(
        Multimodal.jpegEncodeGray(w, h, pix, mode))
      val prog = Multimodal.jpegDecodeLuma(
        Multimodal.jpegEncodeGrayProgressive(w, h, pix, mode))
      assert(base.isDefined && prog.isDefined,
        s"undecodable at mode=$mode ${w}x$h")
      assert(prog.get._1 == w && prog.get._2 == h)
      assert(prog.get._3.sameElements(base.get._3),
        s"progressive != baseline at mode=$mode ${w}x$h")
    }
    // smooth + sparse contents hit the long-EOB-run and ZRL branches
    val grad = Array.tabulate(64 * 64) { i =>
      math.min(255, ((i % 64) + (i / 64)) * 2) }
    val sparse = Array.tabulate(64 * 64) { i =>
      if (i == 64 * 33 + 7) 255 else 128 }
    for (pix <- Seq(grad, sparse)) {
      val base = Multimodal.jpegDecodeLuma(
        Multimodal.jpegEncodeGray(64, 64, pix))
      val prog = Multimodal.jpegDecodeLuma(
        Multimodal.jpegEncodeGrayProgressive(64, 64, pix))
      assert(prog.isDefined &&
        prog.get._3.sameElements(base.get._3))
    }
  }

  test("progressive JPEG: uniform pattern blocks decode exactly; " +
      "truncation classifies as undecodable") {
    val pattern = 0x5a3cc3a5f00f1e87L
    val pix = patternPix(pattern, 40, 200)
    for (mode <- 0 to 2) {
      val bytes = Multimodal.jpegEncodeGrayProgressive(64, 64, pix,
        mode)
      val got = Multimodal.jpegDecodeLuma(bytes)
      assert(got.isDefined, s"undecodable at mode=$mode")
      assert(got.get._3.sameElements(pix),
        s"pixel mismatch at mode=$mode")
      assert(Multimodal.jpegAHash(bytes).contains(pattern))
      // cut inside the entropy data (drop EOI + tail): must be None,
      // not a partial render or a throw
      val cut = java.util.Arrays.copyOfRange(bytes, 0,
        bytes.length - 12)
      assert(Multimodal.jpegDecodeLuma(cut).isEmpty)
    }
  }

  test("synthPatternJpeg plants the hash verbatim; decodeAHash " +
      "sniffs both formats and nulls garbage") {
    val rows = Seq(
      (1L, 40, 120, 0x00000000000000a5L, 0, 0),
      (2L, 50, 200, 0x7fedcba987654321L, 1, 0),
      (3L, 30, 90, -4611686018427387905L, 2, 2), // high bits set
      (4L, 10, 250, 0x0f0f0f0f0f0f0f0fL, 1, 1))
      .toDF("id", "__a", "__b", "__patt", "__mode", "__ri")
    val jpg = Multimodal.synthPatternJpeg(rows, "__a", "__b",
      "__patt", "__mode", "__ri", "content")
    val hashed = Multimodal.decodeBatches(jpg, "content",
      Multimodal.aHashSchema)(Multimodal.decodeAHash)
      .select("id", "ahash").as[(Long, Long)].collect().toMap
    val want = rows.select("id", "__patt").as[(Long, Long)]
      .collect().toMap
    assert(hashed == want)
    // the same kernel still decodes PNG and nulls garbage
    val mixed = Seq((1L, Multimodal.pngEncodeGray(16, 16,
        Array.fill(256)(9))),
        (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "content")
    val mh = Multimodal.decodeBatches(mixed, "content",
      Multimodal.aHashSchema)(Multimodal.decodeAHash)
      .select(col("id"), col("ahash")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(mh(1L).contains(-1L)) // uniform -> all 64 bits set
    assert(mh(2L).isEmpty)
  }
}
