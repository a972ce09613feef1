package graft

import org.apache.spark.sql.functions._

import graft.operators.{Archive, Docx, Markdown, OmniCrawl, Pdf,
  Rtf}

/** The sniff-routed omni compose: every format routes by magic
  * bytes (declared Content-Type lies ignored), extraction is
  * byte-faithful per format, damage classifies as null.
  */
class OmniCrawlSpec extends SparkSpec {
  import spark.implicits._

  private def omniRows(ct: String, payload: Array[Byte],
      gz: Boolean) = {
    val df = Seq((1L, payload, ct, if (gz) 1 else 0))
      .toDF("doc_id", "content", "__ct", "__gz")
    val warc = OmniCrawl.synthHttpWarcs(df, "doc_id", "content",
      "__ct", "__gz", "warc")
    graft.operators.Multimodal.decodeBatches(warc, "warc",
        OmniCrawl.omniSchema)(OmniCrawl.decodeOmni)
      .select("fmt", "is_html", "payload").collect()
  }

  test("all six formats route by sniff even when the declared " +
      "Content-Type lies") {
    val text = "the quick brown fox and some more words here"
    val cases = Seq[(String, Array[Byte], String, String => Boolean)](
      ("html", ("<html><body><p>" + text + "</p></body></html>")
        .getBytes("UTF-8"), "text/html", _.contains(text)),
      ("pdf", pdfOf(text), "application/pdf", _ == text),
      ("docx", docxOf(text), "application/vnd.openxmlformats-" +
        "officedocument.wordprocessingml.document", _ == text),
      ("rtf", rtfOf(text), "application/rtf", _ == text),
      ("epub", epubOf(text), "application/epub+zip",
        _.startsWith(text)),
      ("md", mdOf(text), "text/markdown", _.contains(text)))
    for ((name, payload, wantFmt, check) <- cases;
        gz <- Seq(false, true)) {
      // the declared type always LIES
      val rows = omniRows("application/x-lying-type", payload, gz)
      assert(rows.length == 1, name)
      val r = rows.head
      assert(r.getString(0) == wantFmt, s"$name gz=$gz: ${r}")
      assert(check(r.getString(2)), s"$name gz=$gz text")
      assert(r.getBoolean(1) == (name == "html"), name)
    }
  }

  test("archive-nested payloads unwrap, re-sniff and route (zip/" +
      "tar.gz/7z/cab one level down)") {
    val text = "the quick brown fox and some more words here"
    val pdf = pdfOf(text)
    val rtf = rtfOf(text)
    val cases = Seq(
      ("zip", Archive.zipWrite(Seq(("m.pdf", pdf, true)))),
      ("tgz", Archive.gzipWrite(
        Archive.tarWrite(Seq(("m.rtf", rtf))), "m")),
      ("7z", graft.operators.SevenZip.write(Seq(("m.rtf", rtf, 1)))),
      ("cab", graft.operators.Cab.write(Seq(("m.pdf", pdf, 1)))))
    for ((name, payload) <- cases; gz <- Seq(false, true)) {
      val rows = omniRows("application/x-lying-type", payload, gz)
      assert(rows.length == 1, name)
      val r = rows.head
      assert(!r.isNullAt(2), s"$name gz=$gz refused")
      assert(r.getString(2) == text, s"$name gz=$gz text")
    }
    // the round-16 nested tier: deb / cpio / iso / bare lz4
    val cases16 = Seq(
      ("deb", graft.operators.Ar.debWrite(
        Seq(("./control", "Package: omni\n".getBytes)),
        Seq(("./usr/m.rtf", rtf)), 1)),
      ("cpio", graft.operators.Cpio.cpioWrite(
        Seq(("m.pdf", pdf)), 2)),
      ("iso", graft.operators.Iso.isoWrite(Seq(("m.rtf", rtf)))),
      ("lz4", graft.operators.Lz4.encodeFrame(pdf)),
      ("ar", graft.operators.Ar.arWrite(Seq(("m.pdf", pdf)))))
    for ((name, payload) <- cases16; gz <- Seq(false, true)) {
      val rows = omniRows("application/x-lying-type", payload, gz)
      assert(rows.length == 1, name)
      val r = rows.head
      assert(!r.isNullAt(2), s"$name gz=$gz refused")
      assert(r.getString(2) == text, s"$name gz=$gz text")
    }
    // nested html refuses (no column pipeline inside the kernel)
    val zHtml = Archive.zipWrite(Seq(("m.html",
      ("<html><body><p>" + text + "</p></body></html>")
        .getBytes("UTF-8"), true)))
    val r2 = omniRows("x", zHtml, gz = false)
    assert(r2.head.isNullAt(2))
  }

  test("unroutable and damaged payloads classify as null rows") {
    for (payload <- Seq(
        Array.fill[Byte](64)(0x07), // binary junk
        "%PDF-1.4 damaged".getBytes("UTF-8"))) {
      val rows = omniRows("text/html", payload, gz = false)
      assert(rows.length == 1)
      assert(rows.head.isNullAt(0) && rows.head.isNullAt(2))
    }
  }

  private def pdfOf(text: String): Array[Byte] = {
    val df = Seq((1L, text, 0, 0)).toDF("doc_id", "__t", "__v",
      "__x")
    Pdf.synthPdfs(df, "__t", "__v", "__x", "content")
      .select("content").head().getAs[Array[Byte]](0)
  }
  private def docxOf(text: String): Array[Byte] = {
    val df = Seq((1L, text, 0)).toDF("doc_id", "__t", "__m")
    Docx.synthDocx(df, "__t", "__m", "content")
      .select("content").head().getAs[Array[Byte]](0)
  }
  private def rtfOf(text: String): Array[Byte] = {
    val df = Seq((1L, text, 0)).toDF("doc_id", "__t", "__m")
    Rtf.synthRtf(df, "__t", "__m", "content")
      .select("content").head().getAs[Array[Byte]](0)
  }
  private def epubOf(text: String): Array[Byte] = {
    val df = Seq((1L, text, 0)).toDF("doc_id", "__t", "__m")
    Docx.synthEpub(df, "doc_id", "__t", "__m", "content")
      .select("content").head().getAs[Array[Byte]](0)
  }
  private def mdOf(text: String): Array[Byte] = {
    val df = Seq((1L, text)).toDF("doc_id", "__t")
    Markdown.synthMd(df, "doc_id", "__t", "content")
      .select("content").head().getAs[Array[Byte]](0)
  }
}
