package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Web-feed text extraction — RSS 2.0 and Atom (RFC 4287), the
  * syndication layer a crawl carries for virtually every news site
  * and blog; feed XML is often the cleanest copy of an article
  * summary the crawl will see.
  *
  * The reference repo ingests only CSV
  * (`/root/reference/src/trousse/dataset.py:341`). This rides the
  * shared bounded XML event scanner ([[Docx.scanXml]] — comments,
  * PIs, CDATA, entity unescape, well-formedness refusal) with feed
  * semantics on top:
  *
  *  - Root `rss` (then `channel`) or `feed` decides the dialect;
  *    namespace prefixes are stripped per-element so `<a:feed
  *    xmlns:a=…>` parses identically to the default-namespace form.
  *  - The feed title is only the `<title>` whose IMMEDIATE parent is
  *    `channel`/`feed` — an `<image><title>` or an entry
  *    `<source><title>` never leaks into it (tracked with a real
  *    element stack, not a depth heuristic).
  *  - Per `item`/`entry`: the title, then the body (`description`
  *    for RSS; `summary` or inline `content` for Atom), joined with
  *    one `\n`; items joined with one `\n` in document order. CDATA
  *    bodies arrive raw (no double-unescape).
  *  - Body text is kept verbatim after entity unescape — feeds
  *    commonly carry escaped HTML there, and stripping markup is the
  *    crawl operators' job (the boilerplate-scrub path), not the
  *    format decoder's.
  *
  * Malformed XML or a non-feed root → None. Per-row byte work inside
  * [[Multimodal.decodeBatches]] — map-only, no shuffle.
  */
object Feed {

  private val MaxText = 16 << 20

  /** Decoded feed: channel/feed title, item text in document order,
    * item census, dialect (`rss` | `atom`).
    */
  final case class FeedDoc(title: String, text: String, nItems: Int,
      kind: String)

  private def local(name: String): String = {
    val c = name.indexOf(':')
    if (c >= 0) name.substring(c + 1) else name
  }

  /** Parse a feed. None on malformed XML or a root that is neither
    * `rss` nor `feed`.
    */
  def feedText(b: Array[Byte]): Option[FeedDoc] = {
    if (b == null || b.length < 6) return None
    try {
      val xml = new String(b, StandardCharsets.UTF_8)
      val stack = scala.collection.mutable.ArrayBuffer[String]()
      var kind: String = null
      var feedTitle = new java.lang.StringBuilder
      val items = scala.collection.mutable.ArrayBuffer[String]()
      // per-item accumulation
      var itemDepth = -1
      var itemTitle: java.lang.StringBuilder = null
      var itemBody: java.lang.StringBuilder = null
      var total = 0L
      // which element's text we are inside (immediate element only)
      def top: String = if (stack.isEmpty) "" else stack.last
      def parent: String =
        if (stack.length < 2) "" else stack(stack.length - 2)
      val itemTag = () => if (kind == "atom") "entry" else "item"
      val bodyTags: Set[String] = Set("description", "summary",
        "content")
      Docx.scanXml(xml) { ev =>
        ev match {
          case Docx.Open(rawName, selfClose, _) =>
            val name = local(rawName)
            if (kind == null) {
              // first element decides the dialect
              kind = name match {
                case "rss" => "rss"
                case "feed" => "atom"
                case _ => throw Docx.DocxFail("not a feed root")
              }
            }
            if (!selfClose) {
              stack += name
              if (name == itemTag() && itemDepth < 0) {
                itemDepth = stack.length
                itemTitle = new java.lang.StringBuilder
                itemBody = new java.lang.StringBuilder
              }
            }
          case Docx.Close(_) =>
            if (itemDepth > 0 && stack.length == itemDepth &&
              top == itemTag()) {
              val parts = Seq(itemTitle.toString, itemBody.toString)
                .filter(_.nonEmpty)
              items += parts.mkString("\n")
              itemDepth = -1; itemTitle = null; itemBody = null
            }
            if (stack.nonEmpty) stack.remove(stack.length - 1)
          case Docx.Text(s, raw) =>
            val t = if (raw) s else Docx.xmlUnescape(s)
            total += t.length
            if (total > MaxText) throw Docx.DocxFail("text bomb")
            if (itemDepth > 0) {
              // inside an item: title/body only as IMMEDIATE children
              if (stack.length == itemDepth + 1 &&
                parent == itemTag()) {
                if (top == "title") itemTitle.append(t)
                else if (bodyTags(top)) itemBody.append(t)
              }
            } else if (top == "title" &&
              (parent == "channel" || parent == "feed")) {
              feedTitle.append(t)
            }
        }
      }
      if (kind == null) return None
      Some(FeedDoc(feedTitle.toString, items.mkString("\n"),
        items.length, kind))
    } catch {
      case Docx.DocxFail(_) => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** CDATA-wrap with the `]]>` split rule (a literal `]]>` in the
    * payload would terminate the section early).
    */
  private def cdata(s: String): String =
    "<![CDATA[" + s.replace("]]>", "]]]]><![CDATA[>") + "]]>"

  /** A real feed: `title` + items of (title, body). mode 0: RSS 2.0
    * with escaped text bodies; mode 1: RSS 2.0 with CDATA bodies,
    * comment/PI decoys, and an `<image><title>` trap; mode 2: Atom
    * under a namespace PREFIX (`<a:feed>`) with `summary` bodies and
    * an entry `<source><title>` trap.
    */
  def feedWrite(title: String, items: Seq[(String, String)],
      mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val sb = new java.lang.StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    m match {
      case 2 =>
        sb.append("<a:feed xmlns:a=\"http://www.w3.org/2005/Atom\">\n")
        sb.append("<a:title>").append(esc(title)).append("</a:title>\n")
        sb.append("<a:updated>2026-08-15T00:00:00Z</a:updated>\n")
        for ((it, body) <- items) {
          sb.append("<a:entry>\n")
          sb.append("<a:title>").append(esc(it)).append("</a:title>\n")
          sb.append("<a:link href=\"https://example.test/e\"/>\n")
          // trap: a source's own title must not leak into the entry
          sb.append("<a:source><a:title>decoy source title")
          sb.append("</a:title></a:source>\n")
          if (body.nonEmpty)
            sb.append("<a:summary>").append(esc(body))
              .append("</a:summary>\n")
          sb.append("</a:entry>\n")
        }
        sb.append("</a:feed>\n")
      case 1 =>
        sb.append("<rss version=\"2.0\"><channel>\n")
        sb.append("<!-- decoy comment never reaches text -->\n")
        sb.append("<?pi decoys too?>\n")
        sb.append("<title>").append(esc(title)).append("</title>\n")
        // trap: the channel image's title is not the channel title
        sb.append("<image><url>https://example.test/i.png</url>")
        sb.append("<title>decoy image title</title></image>\n")
        for ((it, body) <- items) {
          sb.append("<item>\n")
          sb.append("<title>").append(esc(it)).append("</title>\n")
          if (body.nonEmpty)
            sb.append("<description>").append(cdata(body))
              .append("</description>\n")
          sb.append("</item>\n")
        }
        sb.append("</channel></rss>\n")
      case _ =>
        sb.append("<rss version=\"2.0\"><channel>\n")
        sb.append("<title>").append(esc(title)).append("</title>\n")
        sb.append("<link>https://example.test/</link>\n")
        for ((it, body) <- items) {
          sb.append("<item>\n")
          sb.append("<title>").append(esc(it)).append("</title>\n")
          if (body.nonEmpty)
            sb.append("<description>").append(esc(body))
              .append("</description>\n")
          sb.append("<guid>tag:example.test,2026:x</guid>\n")
          sb.append("</item>\n")
        }
        sb.append("</channel></rss>\n")
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val feedSchema: StructType = StructType(Seq(
    StructField("feed_title", StringType),
    StructField("feed_text", StringType),
    StructField("n_items", IntegerType),
    StructField("kind", StringType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]. */
  def decodeFeed(bytes: Array[Byte]): Seq[Any] =
    feedText(bytes) match {
      case Some(FeedDoc(ti, te, n, k)) => Seq[Any](ti, te, n, k)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row feed synthesizer (map-only): item 1 carries the row's
    * text as its body under a fixed headline, item 2 is title-only;
    * dialect/layout rotates on doc_id%3.
    */
  def synthFeed(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val bytes = feedWrite("Feed " + (id % 10), Seq(
          ("headline", text),
          ("closer " + (id % 5), "")), (id % 3).toInt)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
