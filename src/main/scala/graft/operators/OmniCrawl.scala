package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The end-to-end sniff-routed curation compose — what a 100 TB
  * crawl run does all day: WARC records (plain and .warc.gz) →
  * HTTP body decode (chunked/Content-Encoding) → magic-byte
  * dispatch ([[Sniff.sniff]] — declared Content-Types LIE and are
  * deliberately ignored) → the per-format text extractor → one text
  * column ready for quality filtering and fingerprint dedup.
  *
  * Formats routed: HTML (returned raw for the codegen'd
  * `htmlToText` Column pipeline — the expression stays in
  * whole-stage codegen instead of a JVM kernel), PDF, DOCX, RTF,
  * EPUB, Markdown. Anything else classifies as unroutable (null
  * text), never throws.
  */
object OmniCrawl {

  /** Wrap a binary payload column as a WARC request/response pair
    * with a per-row declared Content-Type (which the reader must
    * ignore) — `gzCol` = 1 emits .warc.gz.
    */
  def synthHttpWarcs(df: DataFrame, idCol: String, binCol: String,
      ctCol: String, gzCol: String, outCol: String): DataFrame = {
    val (ii, bi, ci, gi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(binCol), df.schema.fieldIndex(ctCol),
      df.schema.fieldIndex(gzCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii)
        val payload = r.getAs[Array[Byte]](bi)
        val ct = r.getString(ci)
        val uri = s"http://example.test/omni/$id"
        val req =
          s"GET /omni/$id HTTP/1.1\r\nHost: example.test\r\n\r\n"
            .getBytes(StandardCharsets.UTF_8)
        val resp = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8) ++ payload
        val bytes = Archive.warcWrite(Seq(
          ("request", uri, req), ("response", uri, resp)),
          gzipped = r.getInt(gi) == 1)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  val omniSchema: StructType = StructType(Seq(
    StructField("fmt", StringType),
    StructField("is_html", BooleanType),
    StructField("payload", StringType)))

  /** Decode kernel: WARC → response body → sniff → route. HTML
    * comes back raw (`is_html` = true) so the query applies the
    * Column-level `htmlToText`; every other supported format
    * extracts here. Unroutable/damaged → all-null row.
    */
  def decodeOmni(bytes: Array[Byte]): Seq[Any] = {
    val res: Option[(String, Boolean, String)] =
      for {
        plain <-
          if (bytes != null && bytes.length > 2 &&
            (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
            Archive.gunzipMembers(bytes)
              .map(ms => ms.foldLeft(Array.emptyByteArray)(_ ++ _))
          else Option(bytes)
        recs <- Archive.warcRecords(plain)
        resp <- recs.find(_.warcType == "response")
        body <- Http.bodyBytes(resp.payload)
        label = Sniff.sniff(body)
        out <- route(label, body)
      } yield (label, out._1, out._2)
    res match {
      case Some((f, h, p)) => Seq[Any](f, h, p)
      case None => Seq[Any](null, null, null)
    }
  }

  private val DocxLabel = "application/vnd.openxmlformats-" +
    "officedocument.wordprocessingml.document"

  private def route(label: String, body: Array[Byte])
      : Option[(Boolean, String)] = label match {
    case "text/html" =>
      Some((true, new String(body, StandardCharsets.UTF_8)))
    case "application/pdf" =>
      Pdf.pdfText(body).map(t => (false, t.text))
    case `DocxLabel` =>
      Docx.docxText(body).map(t => (false, t.text))
    case "application/rtf" =>
      Rtf.rtfText(body).map(t => (false, t.text))
    case "application/epub+zip" =>
      Docx.epubText(body).map(t => (false, t.text))
    case "text/markdown" =>
      Some((false, Markdown.mdText(
        new String(body, StandardCharsets.UTF_8)).text))
    case _ => None // unroutable: classify, never guess
  }
}
