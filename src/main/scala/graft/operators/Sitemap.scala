package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Sitemap parsing (sitemaps.org XML protocol, the de-facto crawl
  * frontier feed referenced by RFC 9309's `Sitemap` field): `urlset`
  * URL entries with their crawl hints, and `sitemapindex` child
  * references — the discovery layer that seeds what a crawler
  * fetches next. Rides the shared bounded XML scanner
  * ([[Docx.scanXml]]): entity unescape, CDATA, comment/PI skipping,
  * quote-aware tags.
  *
  * Exactness contract like everywhere else: `lastmod` (W3C
  * datetime) parses the DATE part to exact epoch days (time-of-day
  * and zone are crawl hints, not identity — documented scope);
  * `priority` parses as exact milli-units via decimal string math
  * (0..1000, out-of-range/garbage → null, never a rounded float);
  * `changefreq` is surfaced verbatim lowercased. A document whose
  * root is neither `urlset` nor `sitemapindex`, or whose XML is
  * torn, refuses as None.
  */
object Sitemap {

  /** One `<url>` / `<sitemap>` entry. `priorityMilli`/`lastmodDay`
    * −1 = absent (kernel surfaces null).
    */
  final case class Entry(loc: String, lastmodDay: Long,
      changefreq: String, priorityMilli: Long)

  /** Parsed document: kind is "urlset" or "sitemapindex". */
  final case class SitemapDoc(kind: String, entries: Seq[Entry])

  private val MaxEntries = 200000 // > the protocol's 50k cap

  /** W3C datetime → epoch day of its DATE part. */
  private def epochDay(s0: String): Long = {
    val s = s0.trim
    if (s.length < 10) throw Docx.DocxFail("short date")
    val d = s.substring(0, 10)
    if (d.charAt(4) != '-' || d.charAt(7) != '-')
      throw Docx.DocxFail("bad date")
    java.time.LocalDate.parse(d).toEpochDay
  }

  /** "0.8"-style priority → exact milli (0..1000). */
  private[graft] def priorityMilli(s0: String): Long = {
    val s = s0.trim
    if (s.isEmpty) throw Docx.DocxFail("empty priority")
    var i = 0
    var intPart = 0L
    var sawDigit = false
    while (i < s.length && s.charAt(i) != '.') {
      val c = s.charAt(i)
      if (c < '0' || c > '9') throw Docx.DocxFail("bad priority")
      intPart = intPart * 10 + (c - '0')
      if (intPart > 1) throw Docx.DocxFail("priority > 1")
      sawDigit = true
      i += 1
    }
    var frac = 0L
    var digits = 0
    if (i < s.length && s.charAt(i) == '.') {
      i += 1
      while (i < s.length && digits < 3) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') throw Docx.DocxFail("bad priority")
        frac = frac * 10 + (c - '0')
        digits += 1
        sawDigit = true
        i += 1
      }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') throw Docx.DocxFail("bad priority")
        i += 1
      }
    }
    if (!sawDigit) throw Docx.DocxFail("empty priority")
    while (digits < 3) { frac *= 10; digits += 1 }
    val v = intPart * 1000L + frac
    if (v > 1000L) throw Docx.DocxFail("priority > 1")
    v
  }

  /** Parse sitemap XML bytes. None for torn XML or a foreign root. */
  def parse(b: Array[Byte]): Option[SitemapDoc] = {
    if (b == null || b.length == 0) return None
    try {
      val xml = new String(b, StandardCharsets.UTF_8)
      var kind: String = null
      var inEntry = false
      var field: String = null
      var loc: String = null
      var lastmod = -1L
      var changefreq: String = null
      var priority = -1L
      val text = new java.lang.StringBuilder
      val entries = Seq.newBuilder[Entry]
      var n = 0
      def local(name: String): String = {
        val c = name.indexOf(':')
        if (c >= 0) name.substring(c + 1) else name
      }
      Docx.scanXml(xml) {
        case Docx.Open(name0, selfClose, _) =>
          val name = local(name0)
          if (kind == null) {
            if (name != "urlset" && name != "sitemapindex")
              throw Docx.DocxFail("foreign root")
            kind = name
          } else if (!inEntry &&
            (name == "url" || name == "sitemap") && !selfClose) {
            inEntry = true
            loc = null; lastmod = -1L; changefreq = null
            priority = -1L
          } else if (inEntry && field == null && !selfClose) {
            name match {
              case "loc" | "lastmod" | "changefreq" | "priority" =>
                field = name
                text.setLength(0)
              case _ => ()
            }
          }
        case Docx.Close(name0) =>
          val name = local(name0)
          if (inEntry && field == name) {
            val v = text.toString.trim
            field match {
              case "loc" => loc = v
              case "lastmod" =>
                // garbage lastmod nulls THIS field, not the document
                // — matching the header contract
                lastmod =
                  try epochDay(v)
                  catch {
                    case Docx.DocxFail(_) => -1L
                    case _: java.time.format.DateTimeParseException =>
                      -1L
                  }
              case "changefreq" =>
                changefreq = v.toLowerCase(java.util.Locale.ROOT)
              case "priority" =>
                priority =
                  try priorityMilli(v)
                  catch { case Docx.DocxFail(_) => -1L }
              case _ => ()
            }
            field = null
          } else if (inEntry && (name == "url" || name == "sitemap")) {
            if (loc != null && loc.nonEmpty) {
              entries += Entry(loc, lastmod, changefreq, priority)
              n += 1
              if (n > MaxEntries) throw Docx.DocxFail("entry bomb")
            }
            inEntry = false
          }
        case Docx.Text(s, raw) =>
          if (field != null)
            text.append(if (raw) s else Docx.xmlUnescape(s))
      }
      if (kind == null) None
      else Some(SitemapDoc(kind, entries.result()))
    } catch {
      case Docx.DocxFail(_) => None
      case _: java.time.format.DateTimeParseException => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val sitemapSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("n_urls", IntegerType),
    StructField("first_loc", StringType),
    StructField("lastmod_day_sum", LongType),
    StructField("priority_milli_sum", LongType),
    StructField("n_daily", IntegerType)))

  /** Decode kernel: per-document aggregate view (counts + exact
    * sums) the oracle replays closed-form.
    */
  def decodeSitemap(bytes: Array[Byte]): Seq[Any] =
    parse(bytes) match {
      case Some(SitemapDoc(kind, es)) => Seq[Any](
        kind, es.length, es.headOption.map(_.loc).orNull,
        es.map(e => math.max(e.lastmodDay, 0L)).sum,
        es.map(e => math.max(e.priorityMilli, 0L)).sum,
        es.count(_.changefreq == "daily"))
      case None => Seq.fill[Any](6)(null)
    }

  /** Fixture writer: a real urlset (mode 0/1) or sitemapindex
    * (mode 2) whose aggregates replay closed-form from the seed.
    * Mode 1 adds namespace prefixes, CDATA locs and entity noise —
    * values identical to mode 0.
    */
  def sitemapWrite(seed: Long, nUrls: Int, mode: Int): Array[Byte] = {
    val m = math.floorMod(mode, 3)
    val sb = new StringBuilder(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    def day(i: Int): String =
      java.time.LocalDate.ofEpochDay(18262L + (seed + i) % 1000)
        .toString // 18262 = 2020-01-01
    if (m == 2) {
      sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/" +
        "schemas/sitemap/0.9\">")
      for (i <- 0 until nUrls)
        sb.append("<sitemap><loc>https://example.org/sm")
          .append(seed).append("_").append(i)
          .append(".xml</loc><lastmod>").append(day(i))
          .append("</lastmod></sitemap>")
      sb.append("</sitemapindex>")
    } else {
      val (pre, ns) =
        if (m == 1) ("sm:",
          " xmlns:sm=\"http://www.sitemaps.org/schemas/sitemap/0.9\"")
        else ("", "")
      sb.append(s"<${pre}urlset$ns>")
      for (i <- 0 until nUrls) {
        sb.append(s"<${pre}url>")
        if (m == 1 && i == 0)
          sb.append(s"<${pre}loc><![CDATA[https://example.org/p")
            .append(seed).append("_").append(i)
            .append(s"]]></${pre}loc>")
        else
          sb.append(s"<${pre}loc>https://example.org/p")
            .append(seed).append("_").append(i)
            .append(s"</${pre}loc>")
        sb.append(s"<${pre}lastmod>").append(day(i))
          .append(s"</${pre}lastmod>")
        sb.append(s"<${pre}changefreq>")
          .append(if ((seed + i) % 2 == 0) "daily" else "weekly")
          .append(s"</${pre}changefreq>")
        sb.append(s"<${pre}priority>0.")
          .append((seed + i) % 10).append(s"</${pre}priority>")
        sb.append(s"</${pre}url>")
      }
      sb.append(s"</${pre}urlset>")
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Per-row synthesizer. */
  def synthSitemaps(df: DataFrame, idCol: String, nCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ni, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(nCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ sitemapWrite(r.getLong(ii),
          r.getInt(ni), r.getInt(mi)))
      }
    }(enc)
  }
}
