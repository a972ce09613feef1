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

  /** Wrap a binary column into an archive for the nested-unwrap
    * tier: kind 0 = ZIP (deflated member), 1 = tar.gz, 2 = 7z
    * (LZMA2 member), 3 = CAB (MSZIP member), 4 = .deb (the member
    * as the data.tar.xz payload), 5 = cpio (newc-CRC), 6 = ISO 9660
    * (Rock Ridge), 7 = a bare LZ4 frame.
    */
  def wrapArchive(df: DataFrame, binCol: String, kindCol: String,
      memberName: String, outCol: String): DataFrame = {
    val (bi, ki) = (df.schema.fieldIndex(binCol),
      df.schema.fieldIndex(kindCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](bi)
        val bytes = r.getInt(ki) match {
          case 0 => Archive.zipWrite(Seq((memberName, payload, true)))
          case 1 => Archive.gzipWrite(
            Archive.tarWrite(Seq((memberName, payload))), memberName)
          case 2 => SevenZip.write(Seq((memberName, payload, 1)))
          case 3 => Cab.write(Seq((memberName, payload, 1)))
          case 4 => Ar.debWrite(
            Seq(("./control", "Package: omni\n".getBytes)),
            Seq((s"./usr/$memberName", payload)), 1)
          case 5 => Cpio.cpioWrite(Seq((memberName, payload)), 2)
          case 6 => Iso.isoWrite(Seq((memberName, payload)))
          case _ => Lz4.encodeFrame(payload)
        }
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

  private val MaxArchiveMembers = 256

  private def route(label: String, body: Array[Byte])
      : Option[(Boolean, String)] = routeDepth(label, body, 0)

  /** Format dispatch with ARCHIVE RECURSION (depth-bounded): a
    * zip / tar / tar.gz / 7z / cab payload unwraps and each member
    * re-sniffs and routes; member texts concatenate in directory
    * order. Nested html is the one refusal inside archives — its
    * extraction lives in the Column pipeline, which cannot run
    * inside the kernel (documented; a crawl corpus routes bare html
    * at the HTTP layer where the fast path applies).
    */
  private def routeDepth(label: String, body: Array[Byte],
      depth: Int): Option[(Boolean, String)] = label match {
    case "text/html" =>
      if (depth == 0)
        Some((true, new String(body, StandardCharsets.UTF_8)))
      else None // see scaladoc: no column pipeline inside archives
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
    case "application/zip" if depth < 2 =>
      Archive.zipEntries(body).flatMap { es =>
        members(depth, es.map(e => Archive.zipExtract(body, e)))
      }
    case "application/gzip" if depth < 2 =>
      Archive.gunzipMembers(body)
        .map(ms => ms.foldLeft(Array.emptyByteArray)(_ ++ _))
        .flatMap(inner =>
          routeDepth(Sniff.sniff(inner), inner, depth + 1))
    case "application/x-tar" if depth < 2 =>
      Archive.tarEntries(body).flatMap { es =>
        members(depth, es.filter(_.typeflag == '0')
          .map(e => Archive.tarExtract(body, e)))
      }
    case "application/x-7z-compressed" if depth < 2 =>
      SevenZip.extractAll(body).flatMap(all =>
        members(depth, all.filter(_._1.method != "empty")
          .map(_._2)))
    case "application/vnd.ms-cab-compressed" if depth < 2 =>
      Cab.extractAll(body).flatMap(all =>
        members(depth, all.map(_._2)))
    case "application/vnd.debian.binary-package" if depth < 2 =>
      // the data.tar payload is the content; control is metadata
      Ar.debFiles(body).flatMap(fs =>
        members(depth, fs.map(Option(_))))
    case "application/x-archive" if depth < 2 =>
      Ar.arEntries(body).flatMap(es =>
        members(depth, es.map(e => Option(e.data))))
    case "application/x-cpio" if depth < 2 =>
      Cpio.cpioEntries(body).flatMap(es =>
        members(depth, es.filter(e =>
          (e.mode & 0xf000L) == 0x8000L || e.mode == 0)
          .map(e => Option(e.data))))
    case "application/x-iso9660-image" if depth < 2 =>
      Iso.isoEntries(body).flatMap(es =>
        members(depth, es.filter(!_.isDir).map(e => Option(e.data))))
    case "application/x-lz4" if depth < 2 =>
      Lz4.decodeFrame(body).flatMap(inner =>
        routeDepth(Sniff.sniff(inner), inner, depth + 1))
    case _ => None // unroutable: classify, never guess
  }

  /** Route every member; ANY undecodable member refuses the whole
    * payload (partial text would silently drop data). Texts join in
    * directory order with newlines.
    */
  private def members(depth: Int,
      ms: Seq[Option[Array[Byte]]]): Option[(Boolean, String)] = {
    if (ms.isEmpty || ms.length > MaxArchiveMembers) return None
    val texts = ms.map {
      case None => return None
      case Some(m) =>
        routeDepth(Sniff.sniff(m), m, depth + 1) match {
          case Some((false, t)) => t
          case _ => return None
        }
    }
    Some((false, texts.mkString("\n")))
  }
}
