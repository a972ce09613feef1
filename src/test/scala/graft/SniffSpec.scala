package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Archive, Docx, Mime, Multimodal, Pdf, Rtf,
  SevenZip, Sniff, WebP, Zstd}

/** Magic-byte format sniffing: every label must be reachable through
  * the repo's own writers, zip-interior disambiguation must tell the
  * five zip-carried document formats apart, and the text/binary
  * fallback must be sane.
  */
class SniffSpec extends AnyFunSuite {

  private val pix = Array.tabulate(64)(i => (i * 4) % 256)

  test("every container/document writer sniffs to its label") {
    assert(Sniff.sniff(Pdf.pdfWrite("x", 0, 0)) == "application/pdf")
    assert(Sniff.sniff(Rtf.rtfWrite("x", 0)) == "application/rtf")
    assert(Sniff.sniff(Docx.docxWrite("x", 0)) ==
      "application/vnd.openxmlformats-officedocument" +
        ".wordprocessingml.document")
    assert(Sniff.sniff(Docx.xlsxWrite(Seq("x"), 0)) ==
      "application/vnd.openxmlformats-officedocument" +
        ".spreadsheetml.sheet")
    assert(Sniff.sniff(Docx.pptxWrite(Seq("x"), 0)) ==
      "application/vnd.openxmlformats-officedocument" +
        ".presentationml.presentation")
    assert(Sniff.sniff(Docx.odtWrite("x", 0)) ==
      "application/vnd.oasis.opendocument.text")
    assert(Sniff.sniff(Docx.epubWrite("x", "f", 0)) ==
      "application/epub+zip")
    assert(Sniff.sniff(Archive.zipWrite(Seq(("a.txt",
      "x".getBytes, false)))) == "application/zip")
    assert(Sniff.sniff(Archive.zipWrite64(Seq(("a.txt",
      "x".getBytes, false)))) == "application/zip")
    assert(Sniff.sniff(Archive.gzipWrite("x".getBytes, "n")) ==
      "application/gzip")
    assert(Sniff.sniff(Archive.tarWrite(Seq(("a", "x".getBytes))))
      == "application/x-tar")
    assert(Sniff.sniff(SevenZip.write(Seq(("a.txt",
      "x".getBytes, 0)))) == "application/x-7z-compressed")
    assert(Sniff.sniff(graft.operators.Cab.write(Seq(("a.txt",
      "x".getBytes, 0)))) == "application/vnd.ms-cab-compressed")
    assert(Sniff.sniff(Mime.emlWrite("s", "b", 0)) ==
      "message/rfc822")
    assert(Sniff.sniff(Mime.mboxWrite(Seq(
      Mime.emlWrite("s", "b", 0)))) == "application/mbox")
  }

  test("image, audio, codec and text labels") {
    assert(Sniff.sniff(Multimodal.pngEncodeGray(8, 8, pix)) ==
      "image/png")
    assert(Sniff.sniff(Multimodal.jpegEncodeGray(8, 8, pix)) ==
      "image/jpeg")
    assert(Sniff.sniff(WebP.encodeGraySubtractGreen(8, 8, pix)) ==
      "image/webp")
    assert(Sniff.sniff(WebP.vp8Write(16, 16, 1, 1, 1, 0, 0)) ==
      "image/webp")
    assert(Sniff.sniff(Zstd.encodeFrame("payload".getBytes)) ==
      "application/zstd")
    assert(Sniff.sniff("plain words é and Ω".getBytes("UTF-8")) ==
      "text/plain")
    assert(Sniff.sniff("<!DOCTYPE html><html></html>".getBytes) ==
      "text/html")
    assert(Sniff.sniff("<?xml version=\"1.0\"?><r/>".getBytes) ==
      "text/xml")
    assert(Sniff.sniff("HTTP/1.1 200 OK\r\n\r\nx".getBytes) ==
      "message/http")
    assert(Sniff.sniff(Array[Byte](0, 1, 2, 3, -1)) ==
      "application/octet-stream")
    assert(Sniff.sniff(Array.emptyByteArray) == "empty")
    assert(Sniff.sniff(null) == "empty")
    // legacy office: the CFB walk resolves the subtype
    assert(Sniff.sniff(graft.operators.Cfb.cfbWrite(Seq(
      ("WordDocument", "doc".getBytes)))) == "application/msword")
    assert(Sniff.sniff(graft.operators.Cfb.cfbWrite(Seq(
      ("Workbook", "xls".getBytes)))) == "application/vnd.ms-excel")
    // magic without a valid directory: damaged, never a throw
    val cfb = Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte,
      0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte) ++
      new Array[Byte](24)
    assert(Sniff.sniff(cfb) == "application/x-cfb-damaged")
  }

  test("BOM-prefixed text sniffs by content, not by BOM bytes") {
    def bom(bs: Int*)(s: String, cs: String): Array[Byte] =
      bs.map(_.toByte).toArray ++ s.getBytes(cs)
    // UTF-8 BOM must not hide the text-family signatures
    assert(Sniff.sniff(bom(0xef, 0xbb, 0xbf)(
      "<!doctype html><p>x</p>", "UTF-8")) == "text/html")
    assert(Sniff.sniff(bom(0xef, 0xbb, 0xbf)(
      "BEGIN:VCALENDAR\nEND:VCALENDAR", "UTF-8")) == "text/calendar")
    assert(Sniff.sniff(bom(0xef, 0xbb, 0xbf)(
      "WEBVTT\n\n00:00.000 --> 00:01.000\ncue", "UTF-8")) ==
      "text/vtt")
    // a UTF-16LE BOM (FF FE) satisfies the MP3 frame-sync heuristic;
    // it must be transcoded and classified as text instead
    assert(Sniff.sniff("<!doctype html><p>x</p>"
      .getBytes("UTF-16LE").patch(0, Array[Byte](-1, -2), 0)) ==
      "text/html")
    assert(Sniff.sniff("plain utf-16 words here"
      .getBytes("UTF-16LE").patch(0, Array[Byte](-1, -2), 0)) ==
      "text/plain")
    // big-endian BOM variant
    assert(Sniff.sniff("<?xml version=\"1.0\"?><gpx></gpx>"
      .getBytes("UTF-16BE").patch(0, Array[Byte](-2, -1), 0)) ==
      "application/gpx+xml")
    // a bare BOM is empty content
    assert(Sniff.sniff(Array[Byte](-17, -69, -65)) == "empty")
  }

  test("magic-less text formats: notebook, srt, vtt, feed dialects") {
    import graft.operators.{Feed, Ipynb, Ppt, Subtitles, Xls}
    assert(Sniff.sniff(Ipynb.ipynbWrite("m", "c", 0)) ==
      "application/x-ipynb+json")
    assert(Sniff.sniff(Subtitles.srtWrite(Seq("cue"), 3L)) ==
      "application/x-subrip")
    assert(Sniff.sniff(Subtitles.vttWrite(Seq("cue"), 3L)) ==
      "text/vtt")
    assert(Sniff.sniff(Feed.feedWrite("f", Seq(("t", "b")), 0)) ==
      "application/rss+xml")
    assert(Sniff.sniff(Feed.feedWrite("f", Seq(("t", "b")), 2)) ==
      "application/atom+xml")
    assert(Sniff.sniff(Xls.xlsWrite("x", 1L)) ==
      "application/vnd.ms-excel")
    assert(Sniff.sniff(Ppt.pptWrite(Seq("x"))) ==
      "application/vnd.ms-powerpoint")
    assert(Sniff.sniff(graft.operators.Sqlite.sqliteWrite(Seq(
      (1L, 1L, "a"), (2L, 2L, "b")))) == "application/vnd.sqlite3")
    assert(Sniff.sniff(graft.operators.Avro.avroWrite(Seq(
      (1L, "a", true, None)), 0)) == "application/avro")
    assert(Sniff.sniff(graft.operators.Vobject.icsWrite(
      "s", "d", 1L, 0)) == "text/calendar")
    assert(Sniff.sniff(graft.operators.Vobject.vcfWrite(
      "f", "o", 0)) == "text/vcard")
    assert(Sniff.sniff(graft.operators.Gpx.gpxWrite("n", 1L, 2)) ==
      "application/gpx+xml")
    assert(Sniff.sniff(graft.operators.Gpx.kmlWrite("n", 1L, 2)) ==
      "application/vnd.google-earth.kml+xml")
    // non-feed xml stays xml; WEBVTT glued to a word does not match
    assert(Sniff.sniff(
      "<?xml version=\"1.0\"?><!-- c --><r/>".getBytes) ==
      "text/xml")
    assert(Sniff.sniff("WEBVTTY\n".getBytes) == "text/plain")
    // a numbered list is not an srt (no timing line)
    assert(Sniff.sniff("1\nfirst thing\n2\nsecond\n".getBytes) ==
      "text/plain")
  }

  test("sitemap xml dialects sniff to their label") {
    assert(Sniff.sniff(graft.operators.Sitemap.sitemapWrite(3L, 2, 0))
      == "application/x-sitemap+xml")
    assert(Sniff.sniff(graft.operators.Sitemap.sitemapWrite(3L, 2, 2))
      == "application/x-sitemap+xml")
  }

  test("bzip2 sniffs and sniffDeep unwraps it") {
    val inner = graft.operators.Docx.docxWrite("bz interior", 0)
    val bz = graft.operators.Bzip2.compress(inner)
    assert(Sniff.sniff(bz) == "application/x-bzip2")
    val (outer, deep) = Sniff.sniffDeep(bz)
    assert(outer == "application/x-bzip2")
    assert(deep == "application/vnd.openxmlformats-officedocument" +
      ".wordprocessingml.document")
  }

  test("xz sniffs and sniffDeep unwraps it") {
    val inner = graft.operators.Archive.tarWrite(Seq(
      ("a.txt", "xz interior".getBytes)))
    val x = graft.operators.Xz.compress(inner)
    assert(Sniff.sniff(x) == "application/x-xz")
    assert(Sniff.sniffDeep(x) ==
      (("application/x-xz", "application/x-tar")))
  }

  test("ebml containers sniff by doc type") {
    assert(Sniff.sniff(graft.operators.Mkv.mkvWrite(webm = true,
      1.0, 2, 2, 8000.0, 1, streamed = false, wideFloat = false))
      == "video/webm")
    assert(Sniff.sniff(graft.operators.Mkv.mkvWrite(webm = false,
      1.0, 2, 2, 8000.0, 1, streamed = true, wideFloat = true))
      == "video/x-matroska")
    assert(Sniff.sniff(Array[Byte](0x1a, 0x45, 0xdf.toByte,
      0xa3.toByte, 0, 0, 0, 0)) == "video/x-matroska-damaged")
  }

  test("cpio and iso images sniff") {
    assert(Sniff.sniff(graft.operators.Cpio.cpioWrite(
      Seq(("f", "x".getBytes)), 1)) == "application/x-cpio")
    assert(Sniff.sniff(graft.operators.Cpio.cpioWrite(
      Seq(("f", "x".getBytes)), 0)) == "application/x-cpio")
    // the magic alone must not catch a text file of digits
    assert(Sniff.sniff(("070701 is a number, " * 9).getBytes) ==
      "text/plain")
    assert(Sniff.sniff(graft.operators.Iso.isoWrite(
      Seq(("f.txt", "x".getBytes)))) ==
      "application/x-iso9660-image")
  }

  test("ar archives sniff, debs classify by the deb(5) contract") {
    val plain = graft.operators.Ar.arWrite(Seq(
      ("m.txt", "member".getBytes)))
    assert(Sniff.sniff(plain) == "application/x-archive")
    val deb = graft.operators.Ar.debWrite(
      Seq(("./control", "Package: s\n".getBytes)),
      Seq(("./usr/f.txt", "x".getBytes)), 1)
    assert(Sniff.sniff(deb) ==
      "application/vnd.debian.binary-package")
    val torn = java.util.Arrays.copyOf(plain, plain.length - 3)
    assert(Sniff.sniff(torn) == "application/x-archive-damaged")
  }

  test("lz4 sniffs (both frame magics) and sniffDeep unwraps it") {
    val inner = graft.operators.Archive.tarWrite(Seq(
      ("a.txt", "lz4 interior".getBytes)))
    val z = graft.operators.Lz4.encodeFrame(inner)
    assert(Sniff.sniff(z) == "application/x-lz4")
    assert(Sniff.sniffDeep(z) ==
      (("application/x-lz4", "application/x-tar")))
    // legacy magic routes too
    assert(Sniff.sniff(Array[Byte](0x02, 0x21, 0x4c, 0x18, 0, 0,
      0, 0)) == "application/x-lz4")
    // a torn frame reports damaged, not a lie
    assert(Sniff.sniffDeep(z.take(z.length - 2))._2 ==
      "application/x-lz4-damaged")
  }

  test("sniffDeep unwraps gzip and zstd to the interior label") {
    import graft.operators.{Feed, Ipynb, Zstd}
    assert(Sniff.sniffDeep(Archive.gzipWrite(
      Archive.tarWrite(Seq(("a.txt", "x".getBytes))), "t")) ==
      (("application/gzip", "application/x-tar")))
    assert(Sniff.sniffDeep(Zstd.encodeFrame(
      Feed.feedWrite("f", Seq(("t", "b")), 0))) ==
      (("application/zstd", "application/rss+xml")))
    // uncompressed payloads: inner == outer
    assert(Sniff.sniffDeep(Ipynb.ipynbWrite("m", "c", 0)) ==
      (("application/x-ipynb+json", "application/x-ipynb+json")))
    // a gzip wrapper whose deflate stream is torn
    val torn = Archive.gzipWrite("payload".getBytes, "p")
    torn(torn.length / 2) = (torn(torn.length / 2) ^ 0x7f).toByte
    val (o, i2) = Sniff.sniffDeep(torn)
    assert(o == "application/gzip")
    assert(i2 == "application/gzip-damaged" ||
      i2 != "application/gzip") // total, never the raw wrapper label
  }

  test("sniff is total under mutation of a zip container") {
    val rnd = new scala.util.Random(0x5F1FFL)
    val valid = Docx.docxWrite("mutate me", 1)
    for (_ <- 0 until 120) {
      val m = valid.clone()
      val k = 1 + rnd.nextInt(4)
      for (_ <- 0 until k)
        m(rnd.nextInt(m.length)) =
          (rnd.nextInt(256) - 128).toByte
      Sniff.sniff(m) // must never throw
    }
    for (cut <- Seq(1, 10, 100, valid.length / 2))
      Sniff.sniff(valid.take(cut))
  }
}
