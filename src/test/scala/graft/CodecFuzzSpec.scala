package graft

import graft.operators.{Archive, Multimodal, WebP}

/** Adversarial-byte robustness for every decoder that faces untrusted
  * crawl content: seeded random mutations (bit flips, truncations,
  * splices) of VALID streams must come back as None/Some — never a
  * thrown exception, which would kill the Spark task instead of
  * quarantining the document. Each decoder also re-proves it never
  * claims another format's magic.
  */
class CodecFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xC0DEC5L)

  private def grad(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + 13) % 256)

  /** Mutations: n single-byte flips, a truncation, a mid splice. */
  private def mutants(valid: Array[Byte], n: Int)
      : Iterator[Array[Byte]] = {
    val flips = Iterator.fill(n) {
      val m = valid.clone()
      val k = 1 + rnd.nextInt(3)
      for (_ <- 0 until k) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      m
    }
    val truncs = Iterator.fill(n / 2) {
      valid.take(1 + rnd.nextInt(math.max(valid.length - 1, 1)))
    }
    val splices = Iterator.fill(n / 2) {
      val at = rnd.nextInt(valid.length)
      val junk = Array.fill[Byte](1 + rnd.nextInt(16))(
        rnd.nextInt(256).toByte)
      valid.take(at) ++ junk ++ valid.drop(at)
    }
    flips ++ truncs ++ splices
  }

  private def assertTotal[T](name: String, valid: Array[Byte],
      decode: Array[Byte] => Option[T], n: Int = 60): Unit = {
    assert(decode(valid).isDefined, s"$name: valid input must decode")
    var i = 0
    for (m <- mutants(valid, n)) {
      try decode(m)
      catch {
        case e: Throwable =>
          fail(s"$name mutant #$i threw ${e.getClass.getSimpleName}: " +
            s"${e.getMessage}")
      }
      i += 1
    }
  }

  test("png decoder is total under mutation") {
    assertTotal("png", Multimodal.pngEncodeGray(24, 16, grad(24, 16)),
      Multimodal.pngDecodeLuma)
  }

  test("jpeg decoder is total under mutation") {
    assertTotal("jpeg", Multimodal.jpegEncodeGray(32, 24, grad(32, 24)),
      Multimodal.jpegDecodeLuma)
  }

  test("gif decoder is total under mutation") {
    assertTotal("gif", Multimodal.gifEncodeGray(24, 16, grad(24, 16),
      interlaced = true), Multimodal.gifDecodeLuma)
  }

  test("bmp decoder is total under mutation") {
    assertTotal("bmp", Multimodal.bmpEncodeGray(24, 16, grad(24, 16)),
      Multimodal.bmpDecodeLuma)
  }

  test("webp decoder is total under mutation (all three layouts)") {
    assertTotal("webp/sg",
      WebP.encodeGraySubtractGreen(24, 16, grad(24, 16)),
      WebP.decodeLuma)
    assertTotal("webp/pred",
      WebP.encodeGrayPredictor(24, 16, grad(24, 16), mode = 11),
      WebP.decodeLuma)
    assertTotal("webp/pal",
      WebP.encodeGrayPalette(24, 16,
        Array.tabulate(24 * 16)(i => 40 + (i % 3) * 60)),
      WebP.decodeLuma)
  }

  test("wav feature/signature decoders are total under mutation") {
    // a valid little WAV via the hex layout the queries use
    val smp = Array.tabulate[Short](64)(k => (k * 251 - 8000).toShort)
    val data = smp.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val hdr = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes); hdr.putInt(36 + data.length)
    hdr.put("WAVE".getBytes); hdr.put("fmt ".getBytes)
    hdr.putInt(16); hdr.putShort(1); hdr.putShort(1)
    hdr.putInt(8000); hdr.putInt(16000); hdr.putShort(2)
    hdr.putShort(16); hdr.put("data".getBytes)
    hdr.putInt(data.length)
    val wav = hdr.array() ++ data
    assertTotal("wav/features", wav,
      (b: Array[Byte]) => Multimodal.wavPcm16Features(b))
    assertTotal("wav/signature", wav, Multimodal.wavAudioSignature)
  }

  test("mp4 meta/timing/sample decoders are total under mutation") {
    assertTotal("mp4/meta",
      Multimodal.mp4EncodeMeta("mp42", 1000, 700L, Seq((64, 48))),
      Multimodal.mp4Meta)
    assertTotal("mp4/meta-avc-sps",
      Multimodal.mp4EncodeMeta("isom", 1000, 700L,
        Seq((0, 0), (1280, 720)), avc = Some((100, 41))),
      Multimodal.mp4Meta)
    assertTotal("mp4/timing",
      Multimodal.mp4EncodeTimed("avc1", 1000, Seq((10L, 2L)),
        Some(Seq(1L, 5L)), leadingBareTrack = true),
      Multimodal.mp4Timing)
    val frames = Seq(Multimodal.jpegEncodeGray(16, 16, grad(16, 16)))
    assertTotal("mp4/mjpeg", Multimodal.mp4EncodeMjpeg(frames),
      Multimodal.mp4MjpegSamples)
  }

  test("mp3/flac metadata parsers are total under mutation") {
    assertTotal("mp3", Multimodal.mp3Encode(6, brIdx = 9, srIdx = 0,
      mono = false), Multimodal.mp3Meta)
    assertTotal("flac", Multimodal.flacEncodeMeta(44100, 2, 16,
      88200L), Multimodal.flacMeta)
    assertTotal("id3tags", Multimodal.mp3EncodeTagged(4, brIdx = 9,
      srIdx = 1, mono = true, "Fuzz Title", "Fuzz Artist",
      "Fuzz Album", encSel = 1), Multimodal.id3TextTags)
  }

  test("exif parser is total under mutation") {
    val jpeg = Multimodal.withExifApp1(
      Multimodal.jpegEncodeGray(16, 16, grad(16, 16)), 6,
      bigEndian = true)
    assertTotal("exif", jpeg, Multimodal.exifOrientation)
  }

  test("archive decoders are total under mutation") {
    val zip = Archive.zipWrite(Seq(
      ("a.txt", "stored entry".getBytes, false),
      ("b.txt", ("deflated " * 40).getBytes, true)))
    assertTotal("zip/entries", zip, Archive.zipEntries)
    // extraction over mutated directories: list then extract each
    for (m <- mutants(zip, 40)) {
      try Archive.zipEntries(m).foreach(_.foreach(e =>
        Archive.zipExtract(m, e)))
      catch {
        case e: Throwable =>
          fail(s"zip extract threw ${e.getClass.getSimpleName}")
      }
    }
    assertTotal("gzip", Archive.gzipWrite("payload text".getBytes),
      Archive.gunzip)
    val tar = Archive.tarWrite(Seq(
      ("a.txt", ("tar member " * 30).getBytes)))
    assertTotal("tar", tar, Archive.tarEntries)
    val warc = Archive.warcWrite(Seq(
      ("response", "http://x.test/a",
        "HTTP/1.1 200 OK\r\n\r\nbody".getBytes)), gzipped = false)
    assertTotal("warc", warc, Archive.warcRecords)
    val warcGz = Archive.warcWrite(Seq(
      ("response", "http://x.test/a",
        "HTTP/1.1 200 OK\r\n\r\nbody".getBytes)), gzipped = true)
    assertTotal("warc.gz", warcGz, Archive.gunzipMembers)
    val warcZst = Archive.warcWriteComp(Seq(
      ("response", "http://x.test/a",
        "HTTP/1.1 200 OK\r\n\r\nbody".getBytes)), 2)
    assertTotal("warc.zst", warcZst, Archive.unwrapWarcBytes)
  }

  test("zstd container walk is total under mutation") {
    val text = ("zstd fuzz payload " * 10).getBytes("UTF-8")
    val stream = graft.operators.Zstd.encodeSkippable(
      Array.fill[Byte](6)(1)) ++
      graft.operators.Zstd.encodeFrame(text, blockSize = 48,
        fcsSel = 1, dictSel = 2, dictId = 9L, withChecksum = true,
        checksum = graft.operators.Zstd.xxhash64(text, 0,
          text.length) & 0xffffffffL) ++
      graft.operators.Zstd.encodeFrame(Array.fill[Byte](30)('r'))
    assertTotal("zstd/meta", stream, graft.operators.Zstd.frameMeta)
    assertTotal("zstd/decode", stream,
      graft.operators.Zstd.decompress)
  }

  test("zstd entropy decoder is total under mutation") {
    // FSE/Huffman-compressed blocks face the mutants too: the
    // own-encoder frame (predefined sequences + direct-weight
    // Huffman) and a reference-CLI frame (fse-compressed weights,
    // 4-stream literals, repeat modes)
    val rnd2 = new scala.util.Random(0x25DFL)
    val words = Seq("fuzz", "entropy", "block", "the", "of", "zstd")
    val text = Seq.fill(3000)(words(rnd2.nextInt(words.length)))
      .mkString(" ").getBytes("UTF-8")
    val own = graft.operators.Zstd.encodeEntropyFrame(text,
      blockSize = 4096, fourStreams = true)
    assertTotal("zstd/entropy-own", own,
      graft.operators.Zstd.decompress)
    val in = getClass.getResourceAsStream("/zstd/text_l19.zst")
    val golden = in.readAllBytes(); in.close()
    assertTotal("zstd/entropy-golden", golden,
      graft.operators.Zstd.decompress)
  }

  test("animated gif decoder is total under mutation") {
    import graft.operators.Multimodal.GifFrame
    val mk = (ph: Int) => Array.tabulate(16 * 16) { i =>
      if (((i % 16) / 2 + (i / 16) / 2 + ph) % 2 == 0) 60 else 200
    }
    val anim = Multimodal.gifEncodeAnimated(16, 16, Seq(
      GifFrame(0, 0, 16, 16, mk(0), 1),
      GifFrame(2, 2, 8, 8, mk(1).take(64), 2, transparentIndex = 60),
      GifFrame(0, 0, 16, 16, mk(1), 3, interlaced = true)))
    assertTotal("gif/anim", anim, Multimodal.gifDecodeFrames)
  }

  test("tiff strip decoder is total under mutation (all " +
      "compressions)") {
    val pix = grad(24, 16)
    for (comp <- Seq(1, 5, 32773))
      assertTotal(s"tiff/comp$comp",
        graft.operators.Tiff.tiffEncodeGray(24, 16, pix, comp,
          bigEndian = comp == 1, photometric = 1, rowsPerStrip = 5,
          predictor = if (comp == 5) 2 else 1),
        graft.operators.Tiff.decodeLuma)
  }

  test("flac pcm decoder is total under mutation (all codings)") {
    val samples = Array.tabulate(300)(i =>
      (((7 * 7919 + i.toLong * 104729) % 65536).toInt - 32768))
    for ((v, m) <- Seq((1, 0), (3, 3), (4, 1)))
      assertTotal(s"flac/v$v/m$m",
        graft.operators.Flac.encode(samples, 2, 16000L, v, m, 64),
        graft.operators.Flac.decodePcm16)
  }

  test("pdf extractor is total under mutation (all layouts)") {
    val text = "planted pdf words " * 8
    // classic xref / xref stream / ObjStm, across content filters
    assertTotal("pdf/classic",
      graft.operators.Pdf.pdfWrite(text, 0, 0),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/xrefstream",
      graft.operators.Pdf.pdfWrite(text, 1, 1),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/objstm",
      graft.operators.Pdf.pdfWrite(text, 3, 2),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/a85+flate",
      graft.operators.Pdf.pdfWrite(text, 4, 2),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/lzw",
      graft.operators.Pdf.pdfWrite(text, 5, 0),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/runlength",
      graft.operators.Pdf.pdfWrite(text, 6, 1),
      graft.operators.Pdf.pdfText)
  }

  test("pdf font decode (CMap/Differences) is total under mutation") {
    val text = "font mapped words é→Ω " * 6
    // Type0 + ToUnicode CMap, /Differences, single-byte ToUnicode —
    // mutated CMap bodies / font dicts must refuse or decode, never
    // throw
    assertTotal("pdf/type0-tounicode",
      graft.operators.Pdf.pdfWriteFontEncoded(text, 0),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/differences",
      graft.operators.Pdf.pdfWriteFontEncoded(text, 1),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/single-byte-tounicode",
      graft.operators.Pdf.pdfWriteFontEncoded(text, 2),
      graft.operators.Pdf.pdfText)
  }

  test("encrypted-pdf decryption is total under mutation") {
    val text = "sealed words é→Ω " * 6
    // mutated O/U/P/ID/ciphertext must refuse or decode, never
    // throw — bad AES padding, short keys, torn Encrypt dicts
    assertTotal("pdf/rc4-40",
      graft.operators.Pdf.pdfWriteEncryptedStd(text, 0, 3L),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/rc4-128",
      graft.operators.Pdf.pdfWriteEncryptedStd(text, 1, 3L),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/aes-128",
      graft.operators.Pdf.pdfWriteEncryptedStd(text, 2, 3L),
      graft.operators.Pdf.pdfText)
    assertTotal("pdf/aes-256-r6",
      graft.operators.Pdf.pdfWriteEncryptedStd(text, 3, 3L),
      graft.operators.Pdf.pdfText)
  }

  test("docx/xlsx extractors are total under mutation") {
    val text = "ooxml planted words é→Ω\nsecond para " * 4
    assertTotal("docx/stored",
      graft.operators.Docx.docxWrite(text, 0),
      graft.operators.Docx.docxText)
    assertTotal("docx/deflate-runs",
      graft.operators.Docx.docxWrite(text, 1),
      graft.operators.Docx.docxText)
    assertTotal("docx/decoys",
      graft.operators.Docx.docxWrite(text, 2),
      graft.operators.Docx.docxText)
    val items = Seq("shared one", "shared & two", "three")
    assertTotal("xlsx/plain",
      graft.operators.Docx.xlsxWrite(items, 0),
      graft.operators.Docx.xlsxStrings)
    assertTotal("xlsx/rich",
      graft.operators.Docx.xlsxWrite(items, 1),
      graft.operators.Docx.xlsxStrings)
    assertTotal("xlsx-cells/plain",
      graft.operators.Docx.xlsxCellsWrite(items, 11L, 0),
      graft.operators.Docx.xlsxCells)
    assertTotal("xlsx-cells/two-sheet",
      graft.operators.Docx.xlsxCellsWrite(items, 11L, 2),
      graft.operators.Docx.xlsxCells)
    assertTotal("pptx/slides",
      graft.operators.Docx.pptxWrite(Seq("one\ntwo", "three"), 1),
      graft.operators.Docx.pptxText)
    assertTotal("odt/content",
      graft.operators.Docx.odtWrite("odt body\ttext  here", 2),
      graft.operators.Docx.odtText)
    assertTotal("rtf/uN",
      graft.operators.Rtf.rtfWrite("rtf planted é→Ω\nsecond", 0),
      graft.operators.Rtf.rtfText)
    assertTotal("rtf/cp1252-tables",
      graft.operators.Rtf.rtfWrite("rtf planted é\nsecond", 1),
      graft.operators.Rtf.rtfText)
    assertTotal("rtf/starred-uc2",
      graft.operators.Rtf.rtfWrite("rtf planted é→Ω", 2),
      graft.operators.Rtf.rtfText)
    assertTotal("epub/spine",
      graft.operators.Docx.epubWrite("epub chapter\ntwo", "foot", 1),
      graft.operators.Docx.epubText)
    assertTotal("eml/qp",
      graft.operators.Mime.emlWrite("subj é", "mail body é→Ω", 0),
      graft.operators.Mime.emlText)
    assertTotal("eml/nested-multipart",
      graft.operators.Mime.emlWrite("subj", "mail body two", 2),
      graft.operators.Mime.emlText)
    assertTotal("mbox",
      graft.operators.Mime.mboxWrite(Seq(
        graft.operators.Mime.emlWrite("a", "first", 0),
        graft.operators.Mime.emlWrite("b", "second", 1))),
      graft.operators.Mime.mboxMessages)
    assertTotal("doc/piece-table",
      graft.operators.Cfb.docWrite("legacy doc words é→Ω\nsecond"),
      graft.operators.Cfb.docText)
    assertTotal("xls/biff8",
      graft.operators.Xls.xlsWrite("legacy xls cells é→Ω\nrow", 21L),
      graft.operators.Xls.xlsCells)
    assertTotal("ppt/records",
      graft.operators.Ppt.pptWrite(Seq("legacy ppt é→Ω\nslide", "Ω2")),
      graft.operators.Ppt.pptText)
    assertTotal("ipynb/nbformat4",
      graft.operators.Ipynb.ipynbWrite("md é→Ω\nprose", "code()", 1),
      graft.operators.Ipynb.ipynbText)
    assertTotal("srt/blocks",
      graft.operators.Subtitles.srtWrite(Seq("cue é→Ω", "two"), 9L),
      graft.operators.Subtitles.srtText)
    assertTotal("vtt/cues",
      graft.operators.Subtitles.vttWrite(Seq("cue é→Ω", "two"), 9L),
      graft.operators.Subtitles.vttText)
    assertTotal("feed/rss-cdata",
      graft.operators.Feed.feedWrite("f é→Ω",
        Seq(("t", "b ]]> c")), 1),
      graft.operators.Feed.feedText)
    assertTotal("msg/oxmsg",
      graft.operators.Msg.msgWrite("s é→Ω", "body é→Ω", "f", 2),
      graft.operators.Msg.msgText)
    assertTotal("ics/vevent",
      graft.operators.Vobject.icsWrite("s é→Ω", "d é→Ω\nx", 3L, 2),
      graft.operators.Vobject.icsText)
    assertTotal("vcf/card",
      graft.operators.Vobject.vcfWrite("fn é→Ω", "org", 2),
      graft.operators.Vobject.vcfText)
    assertTotal("sqlite/btree",
      graft.operators.Sqlite.sqliteWrite(Seq(
        (1L, 4L, "fuzz é→Ω"), (2L, 5L, "o" * 900), (3L, 6L, "t"))),
      graft.operators.Sqlite.sqliteRead)
    assertTotal("dbf/fixed-width",
      graft.operators.Dbf.dbfWrite(Seq(
        ("fuzz title", "fixed width body", 11L),
        ("second", "row", 12L))),
      graft.operators.Dbf.dbfRead)
    assertTotal("avro/container",
      graft.operators.Avro.avroWrite(Seq(
        (9L, "fuzz é→Ω", true, Some("n")),
        (10L, "row", false, None)), 1),
      graft.operators.Avro.avroRead)
    assertTotal("gpx/trkpts",
      graft.operators.Gpx.gpxWrite("fuzz é→Ω", 11L, 3),
      graft.operators.Gpx.gpxTrace)
    assertTotal("kml/coordinates",
      graft.operators.Gpx.kmlWrite("fuzz é→Ω", 11L, 3),
      graft.operators.Gpx.kmlTrace)
    assertTotal("png/meta-chunks",
      graft.operators.PngMeta.pngWithMeta(
        graft.operators.Multimodal.pngEncodeGray(8, 8,
          Array.tabulate(64)(i => (i * 4) % 256)),
        "mut é", "desc é→Ω", "c Ω", 43L, (2026, 8, 15, 1, 2, 3)),
      graft.operators.PngMeta.pngTexts)
    assertTotal("exif/app1",
      graft.operators.Exif.exifWrap(
        graft.operators.Multimodal.jpegEncodeGray(8, 8,
          Array.tabulate(64)(i => (i * 4) % 256)),
        5, "2026:08:15 01:02:03", 123456L, 654321L),
      graft.operators.Exif.exifMeta)
  }

  test("robots/sitemap parsers are total under mutation") {
    assertTotal("robots",
      graft.operators.Robots.robotsWrite(17L, 0),
      graft.operators.Robots.parse)
    assertTotal("sitemap/urlset",
      graft.operators.Sitemap.sitemapWrite(17L, 5, 1),
      graft.operators.Sitemap.parse)
    assertTotal("sitemap/index",
      graft.operators.Sitemap.sitemapWrite(17L, 5, 2),
      graft.operators.Sitemap.parse)
  }

  test("bzip2 codec is total under own-encoder mutation") {
    val text = ("bzip2 fuzz content with runs aaaaaa and words " +
      "words words ") * 8
    assertTotal("bzip2",
      graft.operators.Bzip2.compress(text.getBytes("UTF-8")),
      graft.operators.Bzip2.decompress(_: Array[Byte]))
  }

  test("snappy and complex-avro decoders are total under mutation") {
    assertTotal("snappy",
      org.xerial.snappy.Snappy.compress(
        ("snappy fuzz corpus " * 30).getBytes("UTF-8")),
      graft.operators.Snappy.decompress(_: Array[Byte]))
    val valid = graft.operators.Avro.avroWriteComplex(14L)
    assert(graft.operators.Avro.decodeAvroComplex(valid).head != null)
    for (m <- mutants(valid, 60)) {
      try graft.operators.Avro.decodeAvroComplex(m)
      catch {
        case e: Throwable =>
          fail(s"avro complex threw ${e.getClass.getSimpleName}")
      }
    }
  }

  test("heif dims walk is total under own-writer mutation") {
    val valid = graft.operators.Heif.write("heic", "hvc1", 320, 240,
      3, 2)
    assertTotal("heif", valid, graft.operators.Heif.heifMeta)
  }

  test("7z walk is total under own-writer mutation") {
    val valid = graft.operators.SevenZip.write(Seq(
      ("a.txt", ("seven zip fuzz member " * 20).getBytes("UTF-8"),
        0),
      ("b.txt", ("lzma2 chunked member " * 40).getBytes("UTF-8"),
        1),
      ("c.txt", ("deflate member " * 30).getBytes("UTF-8"), 2)))
    assertTotal("7z/entries", valid,
      graft.operators.SevenZip.entries)
    assertTotal("7z/extract", valid,
      graft.operators.SevenZip.extractAll)
  }

  test("xz decoder is total under own-encoder mutation") {
    val text = ("xz fuzz content with words words words é→Ω ") * 10
    assertTotal("xz/container",
      graft.operators.Xz.compress(text.getBytes("UTF-8")),
      graft.operators.Xz.decompress(_: Array[Byte]))
  }

  test("lz4 frame decoder is total under own-encoder mutation") {
    val text = ("lz4 fuzz content with repeated repeated repeated " +
      "words é→Ω ") * 10
    assertTotal("lz4/frame",
      graft.operators.Lz4.encodeFrame(text.getBytes("UTF-8")),
      graft.operators.Lz4.decodeFrame(_: Array[Byte]))
  }

  test("brotli decoder is total under own-encoder mutation") {
    val text = ("brotli fuzz content é→Ω with repeated repeated " +
      "repeated words ") * 8
    assertTotal("brotli/entropy",
      graft.operators.Brotli.encodeEntropy(text.getBytes("UTF-8")),
      graft.operators.Brotli.decompress(_: Array[Byte]))
    assertTotal("brotli/stored",
      graft.operators.Brotli.encodeStored(text.getBytes("UTF-8")),
      graft.operators.Brotli.decompress(_: Array[Byte]))
  }

  test("vp8 lossy header parse is total under mutation") {
    assertTotal("vp8/meta",
      graft.operators.WebP.vp8Write(320, 240, 90, 33, 5, 2, 0),
      graft.operators.WebP.vp8Meta)
  }

  test("npy/npz parsers are total under own-writer mutation") {
    val data = Array.tabulate[Byte](48)(i => (i * 5).toByte)
    assertTotal("npy",
      graft.operators.Npy.npyWrite("<i4", fortran = false,
        Seq(12L), data),
      graft.operators.Npy.npyMeta)
    assertTotal("npz",
      Archive.zipWrite(Seq(("a.npy",
        graft.operators.Npy.npyWrite("<i8", fortran = false,
          Seq(6L), data), true))),
      graft.operators.Npy.npzEntries)
  }

  test("pickle census is total under own-writer mutation") {
    assertTotal("pickle/dict2",
      graft.operators.Pickle.writeDict2(99L, 5),
      graft.operators.Pickle.pickleCensus)
    assertTotal("pickle/list4",
      graft.operators.Pickle.writeList4(99L, 4),
      graft.operators.Pickle.pickleCensus)
  }

  test("safetensors/gguf parsers are total under own-writer " +
      "mutation") {
    assertTotal("safetensors",
      graft.operators.SafeTensors.stWrite(Seq(
        ("w", "F32", Seq(4L, 2L)), ("b", "I8", Seq(4L)))),
      graft.operators.SafeTensors.stMeta)
    assertTotal("gguf",
      graft.operators.Gguf.ggufWrite("llama", "f", 3,
        Seq(("t", Seq(8L, 2L), 8))),
      graft.operators.Gguf.ggufMeta)
  }

  test("cbor/msgpack censuses are total under own-writer mutation") {
    val cw = new graft.operators.Cbor.Writer
    cw.mapHead(2L).text("a").uint(1L).text("b")
      .arrayHead(2L).uint(2L).uint(3L)
    assertTotal("cbor", cw.result(),
      graft.operators.Cbor.cborCensus)
    val mw = new graft.operators.MsgPack.Writer
    mw.mapHead(2).str("a").int(1L).str("b").bool(false)
    assertTotal("msgpack", mw.result(),
      graft.operators.MsgPack.mpCensus)
  }

  test("tfrecord walk is total under own-writer mutation") {
    assertTotal("tfrecord",
      graft.operators.TfRecord.tfWrite(Seq(
        "alpha payload".getBytes, "beta payload longer".getBytes)),
      graft.operators.TfRecord.tfFacts)
  }

  test("ogg container walk is total under mutation (both codecs)") {
    assertTotal("ogg/vorbis-span",
      graft.operators.Ogg.oggWrite(opus = false, rate = 44100,
        channels = 2, preSkip = 0, granule = 44100L, title = "t",
        artist = "a", spanComment = true),
      graft.operators.Ogg.oggMeta)
    assertTotal("ogg/opus",
      graft.operators.Ogg.oggWrite(opus = true, rate = 48000,
        channels = 2, preSkip = 312, granule = 4800L, title = "t",
        artist = "a"),
      graft.operators.Ogg.oggMeta)
  }
}
