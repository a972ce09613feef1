package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** iCalendar (.ics, RFC 5545) and vCard (.vcf, RFC 6350 / 2.1) text
  * extraction — the calendar/contact layer of mail and web corpora
  * (meeting descriptions are real prose; contact cards are entity
  * data).
  *
  * The reference repo ingests only CSV
  * (`/root/reference/src/trousse/dataset.py:341`). Both formats are
  * "vobject" content lines, so they share one parser core:
  *
  *  - Line UNFOLDING first (RFC 5545 §3.1): CRLF-or-LF followed by
  *    one SPACE or HTAB splices — folds may land anywhere, including
  *    inside an escape sequence, so unfolding precedes everything.
  *  - Content lines `NAME(;PARAM=VAL)*:VALUE` with parameter values
  *    optionally double-quoted (a quoted `:` or `;` must not split
  *    the line — the scan is quote-aware).
  *  - TEXT unescape: `\\n`/`\\N` → newline, `\\,` `\\;` `\\\\`
  *    literal; a dangling backslash refuses.
  *  - ICS: VEVENT census, SUMMARY + DESCRIPTION per event in
  *    document order, exact summed DTSTART→DTEND duration in
  *    seconds (basic UTC form `yyyymmddThhmmssZ`; date-only and
  *    zoned forms contribute 0 rather than a guessed offset —
  *    time-zone database semantics are not this decoder's call).
  *  - VCF: FN + ORG + one EMAIL per card; vCard 2.1's
  *    `ENCODING=QUOTED-PRINTABLE` parameter decodes through the
  *    shared MIME QP decoder ([[Mime.qpDecode]]) before unescaping.
  *
  * BEGIN/END nesting is tracked for real — a VEVENT inside a
  * VALARM's parent, or an unterminated component, refuses. Per-row
  * byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Vobject {

  private object VFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  final case class IcsDoc(text: String, nEvents: Int,
      durationS: Long)
  final case class VcfDoc(text: String, nCards: Int)

  /** One parsed content line. */
  private final case class CLine(name: String,
      params: Map[String, String], value: String)

  /** Unfold then split into content lines. */
  private def contentLines(s: String): Iterator[CLine] = {
    val unfolded = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r' && i + 2 < n && s.charAt(i + 1) == '\n' &&
        (s.charAt(i + 2) == ' ' || s.charAt(i + 2) == '\t')) i += 3
      else if (c == '\n' && i + 1 < n &&
        (s.charAt(i + 1) == ' ' || s.charAt(i + 1) == '\t')) i += 2
      else { unfolded.append(c); i += 1 }
    }
    unfolded.toString.split("\r\n|\n", -1).iterator
      .filter(_.nonEmpty).map(parseLine)
  }

  /** `NAME(;PARAM=VAL)*:VALUE`, quote-aware. */
  private def parseLine(line: String): CLine = {
    var i = 0
    var inQuote = false
    var colon = -1
    while (i < line.length && colon < 0) {
      line.charAt(i) match {
        case '"' => inQuote = !inQuote
        case ':' if !inQuote => colon = i
        case _ => ()
      }
      i += 1
    }
    if (colon <= 0) throw VFail
    val head = line.substring(0, colon)
    val value = line.substring(colon + 1)
    val parts = {
      // split head on unquoted ';'
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val cur = new java.lang.StringBuilder
      var q = false
      head.foreach {
        case '"' => q = !q; cur.append('"')
        case ';' if !q => out += cur.toString; cur.setLength(0)
        case c => cur.append(c)
      }
      out += cur.toString
      out
    }
    val name = parts.head.trim.toUpperCase(java.util.Locale.ROOT)
    if (name.isEmpty) throw VFail
    val params = parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      // vCard 2.1 allows bare property params (;QUOTED-PRINTABLE)
      if (eq < 0) Some(p.trim.toUpperCase(java.util.Locale.ROOT) ->
        "")
      else Some(p.substring(0, eq).trim
        .toUpperCase(java.util.Locale.ROOT) ->
        p.substring(eq + 1).stripPrefix("\"").stripSuffix("\"")
          .toUpperCase(java.util.Locale.ROOT))
    }.toMap
    CLine(name, params, value)
  }

  /** TEXT value unescape (RFC 5545 §3.3.11). */
  private[graft] def unescapeText(v: String): String = {
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\') {
        if (i + 1 >= v.length) throw VFail
        v.charAt(i + 1) match {
          case 'n' | 'N' => out.append('\n')
          case ch => out.append(ch)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Basic UTC datetime `yyyymmddThhmmssZ` → epoch-day-relative
    * seconds (enough for exact differences). None for date-only or
    * zoned forms.
    */
  private def utcSeconds(v: String): Option[Long] = {
    if (v.length != 16 || v.charAt(8) != 'T' ||
      v.charAt(15) != 'Z') return None
    def num(from: Int, len: Int): Long = {
      var x = 0L
      var i = from
      while (i < from + len) {
        val c = v.charAt(i)
        if (c < '0' || c > '9') throw VFail
        x = x * 10 + (c - '0')
        i += 1
      }
      x
    }
    // days since a fixed epoch via the standard civil-date formula
    val (y, mo, d) = (num(0, 4), num(4, 2), num(6, 2))
    if (mo < 1 || mo > 12 || d < 1 || d > 31) throw VFail
    val yy = if (mo <= 2) y - 1 else y
    val era = yy / 400
    val yoe = yy - era * 400
    val doy = (153 * (mo + (if (mo > 2) -3 else 9)) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val days = era * 146097 + doe
    val (h, mi, se) = (num(9, 2), num(11, 2), num(13, 2))
    if (h > 23 || mi > 59 || se > 60) throw VFail
    Some(days * 86400 + h * 3600 + mi * 60 + se)
  }

  /** Parse an .ics. None on missing VCALENDAR wrapper, unbalanced
    * components, or malformed content lines.
    */
  def icsText(b: Array[Byte]): Option[IcsDoc] = {
    if (b == null || b.length < 15) return None
    try {
      val s = new String(b, StandardCharsets.UTF_8)
      val stack = scala.collection.mutable.ArrayBuffer[String]()
      var sawCal = false
      val events = scala.collection.mutable.ArrayBuffer[String]()
      var dur = 0L
      var total = 0L
      var summary: String = null
      var desc: String = null
      var start: Option[Long] = None
      var end: Option[Long] = None
      contentLines(s).foreach { cl =>
        cl.name match {
          case "BEGIN" =>
            val comp = cl.value.trim
              .toUpperCase(java.util.Locale.ROOT)
            if (stack.isEmpty && comp != "VCALENDAR") throw VFail
            if (comp == "VCALENDAR") sawCal = true
            if (comp == "VEVENT") {
              if (stack.lastOption.contains("VEVENT")) throw VFail
              summary = null; desc = null; start = None; end = None
            }
            stack += comp
          case "END" =>
            val comp = cl.value.trim
              .toUpperCase(java.util.Locale.ROOT)
            if (stack.isEmpty || stack.last != comp) throw VFail
            stack.remove(stack.length - 1)
            if (comp == "VEVENT") {
              val parts = Seq(Option(summary), Option(desc))
                .flatten.filter(_.nonEmpty)
              events += parts.mkString("\n")
              for (a <- start; z <- end) {
                if (z < a) throw VFail
                dur += z - a
              }
            }
          case _ if stack.lastOption.contains("VEVENT") =>
            cl.name match {
              case "SUMMARY" => summary = unescapeText(cl.value)
              case "DESCRIPTION" => desc = unescapeText(cl.value)
              case "DTSTART" => start = utcSeconds(cl.value.trim)
              case "DTEND" => end = utcSeconds(cl.value.trim)
              case _ => ()
            }
            total += cl.value.length
            if (total > MaxText) throw VFail
          case _ => ()
        }
      }
      if (!sawCal || stack.nonEmpty) throw VFail
      // text-less events count in the census but add no separator
      Some(IcsDoc(events.filter(_.nonEmpty).mkString("\n"),
        events.length, dur))
    } catch {
      case VFail => None
    }
  }

  /** Parse a .vcf (one or more concatenated cards). None on a
    * missing VCARD wrapper or structural damage.
    */
  def vcfText(b: Array[Byte]): Option[VcfDoc] = {
    if (b == null || b.length < 12) return None
    try {
      val s = new String(b, StandardCharsets.UTF_8)
      var depth = 0
      var nCards = 0
      val cards = scala.collection.mutable.ArrayBuffer[String]()
      var fn: String = null
      var org: String = null
      var email: String = null
      var total = 0L
      var sawAny = false
      contentLines(s).foreach { cl =>
        cl.name match {
          case "BEGIN" =>
            if (cl.value.trim.toUpperCase(java.util.Locale.ROOT)
              != "VCARD") throw VFail
            if (depth != 0) throw VFail // vCard does not nest
            depth = 1; sawAny = true
            fn = null; org = null; email = null
          case "END" =>
            if (depth != 1) throw VFail
            depth = 0; nCards += 1
            val parts = Seq(Option(fn), Option(org), Option(email))
              .flatten.filter(_.nonEmpty)
            cards += parts.mkString("\n")
          case _ if depth == 1 =>
            // vCard 2.1 QP carries raw bytes — QP-decode INSTEAD of
            // the 3.0/4.0 TEXT unescape (2.1 has no \n escaping; a
            // decoded backslash is a literal backslash)
            val qp = cl.params.get("ENCODING")
              .contains("QUOTED-PRINTABLE") ||
              cl.params.contains("QUOTED-PRINTABLE")
            val rawVal =
              if (qp) new String(Mime.qpDecode(cl.value),
                StandardCharsets.UTF_8)
              else cl.value
            def textVal: String =
              if (qp) rawVal else unescapeText(rawVal)
            cl.name match {
              case "FN" => fn = textVal
              case "ORG" => org = textVal
              case "EMAIL" => email = textVal
              case _ => ()
            }
            total += rawVal.length
            if (total > MaxText) throw VFail
          case _ => ()
        }
      }
      if (!sawAny || depth != 0) throw VFail
      Some(VcfDoc(cards.filter(_.nonEmpty).mkString("\n"), nCards))
    } catch {
      case VFail => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writers
  // ------------------------------------------------------------------

  private[graft] def escapeText(s: String): String = {
    val out = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => out.append("\\\\")
      case ';' => out.append("\\;")
      case ',' => out.append("\\,")
      case '\n' => out.append("\\n")
      case c => out.append(c)
    }
    out.toString
  }

  /** RFC 5545 §3.1 folding at ~72 chars on char boundaries (folds
    * may split escape sequences — the reader must unfold first —
    * but never a surrogate pair: the fold happens in char space and
    * a split pair becomes two unencodable lone surrogates at
    * UTF-8-write time).
    */
  private def fold(line: String): String = {
    if (line.length <= 72) return line
    val out = new java.lang.StringBuilder(line.length + 16)
    var i = 0
    while (i < line.length) {
      var take = math.min(72, line.length - i)
      if (i + take < line.length &&
        Character.isHighSurrogate(line.charAt(i + take - 1)) &&
        Character.isLowSurrogate(line.charAt(i + take)))
        take = if (take > 1) take - 1 else take + 1
      if (i > 0) out.append("\r\n ")
      out.append(line, i, i + take)
      i += take
    }
    out.toString
  }

  private def utcStamp(s: Long): String = {
    val days = s / 86400
    val rem = s % 86400
    // invert the civil-date formula
    val era = days / 146097
    val doe = days - era * 146097
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y0 = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val mo = if (mp < 10) mp + 3 else mp - 9
    val y = if (mo <= 2) y0 + 1 else y0
    f"$y%04d$mo%02d$d%02dT${rem / 3600}%02d${rem % 3600 / 60}%02d${rem % 60}%02dZ"
  }

  /** Deterministic event window i of `seed`: starts at a fixed 2026
    * base + seed minutes + 2h·i, runs 1800 + (seed%11)·60 seconds.
    */
  private def eventTimes(seed: Long, i: Int): (Long, Long) = {
    // 740110 days after 0000-03-01 (the formula's basis) ≈ mid-2026
    val base = 740110L * 86400 + (seed % 1440) * 60 + 7200L * i
    (base, base + 1800 + (seed % 11) * 60)
  }

  /** A real two-event VCALENDAR: event 1 carries `summary` +
    * `description` (TEXT-escaped; mode 1 folds aggressively so folds
    * land inside escapes; mode 2 adds a VALARM subcomponent and
    * parameterized properties), event 2 is a fixed closer.
    */
  def icsWrite(summary: String, description: String, seed: Long,
      mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val sb = new java.lang.StringBuilder
    def line(l: String): Unit = {
      sb.append(if (m == 1) fold(l) else l).append("\r\n")
    }
    line("BEGIN:VCALENDAR")
    line("VERSION:2.0")
    line("PRODID:-//graft//fixture//EN")
    val (s1, e1) = eventTimes(seed, 0)
    line("BEGIN:VEVENT")
    line("UID:evt-" + seed + "-1@example.test")
    line("DTSTART:" + utcStamp(s1))
    line("DTEND:" + utcStamp(e1))
    if (m == 2)
      line("SUMMARY;LANGUAGE=en;X-PARAM=\"a:b;c\":" +
        escapeText(summary))
    else line("SUMMARY:" + escapeText(summary))
    line("DESCRIPTION:" + escapeText(description))
    if (m == 2) {
      line("BEGIN:VALARM")
      line("ACTION:DISPLAY")
      line("DESCRIPTION:decoy alarm text")
      line("TRIGGER:-PT15M")
      line("END:VALARM")
    }
    line("END:VEVENT")
    val (s2, e2) = eventTimes(seed, 1)
    line("BEGIN:VEVENT")
    line("UID:evt-" + seed + "-2@example.test")
    line("DTSTART:" + utcStamp(s2))
    line("DTEND:" + utcStamp(e2))
    line("SUMMARY:closing event " + (seed % 9))
    line("END:VEVENT")
    line("END:VCALENDAR")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** A real vCard: FN/ORG/EMAIL. mode 0: vCard 4.0 plain; mode 1:
    * folded hard; mode 2: vCard 2.1 with QUOTED-PRINTABLE FN.
    */
  def vcfWrite(fn: String, org: String, mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val sb = new java.lang.StringBuilder
    def line(l: String): Unit =
      sb.append(if (m == 1) fold(l) else l).append("\r\n")
    line("BEGIN:VCARD")
    line(if (m == 2) "VERSION:2.1" else "VERSION:4.0")
    if (m == 2) {
      val qp = fn.getBytes(StandardCharsets.UTF_8).map { b =>
        val c = b & 0xff
        if (c >= 33 && c <= 126 && c != '=' && c != ';' && c != ',' &&
          c != '\\') c.toChar.toString
        else f"=$c%02X"
      }.mkString
      line("FN;ENCODING=QUOTED-PRINTABLE;CHARSET=UTF-8:" + qp)
    } else line("FN:" + escapeText(fn))
    line("ORG:" + escapeText(org))
    line("EMAIL;TYPE=work:card@example.test")
    line("NOTE:decoy note never extracted as fn/org")
    line("END:VCARD")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val icsSchema: StructType = StructType(Seq(
    StructField("cal_text", StringType),
    StructField("n_events", IntegerType),
    StructField("duration_s", LongType)))

  val vcfSchema: StructType = StructType(Seq(
    StructField("card_text", StringType),
    StructField("n_cards", IntegerType)))

  def decodeIcs(bytes: Array[Byte]): Seq[Any] =
    icsText(bytes) match {
      case Some(IcsDoc(t, n, d)) => Seq[Any](t, n, d)
      case None => Seq[Any](null, null, null)
    }
  def decodeVcf(bytes: Array[Byte]): Seq[Any] =
    vcfText(bytes) match {
      case Some(VcfDoc(t, n)) => Seq[Any](t, n)
      case None => Seq[Any](null, null)
    }

  /** Per-row .ics synthesizer (map-only): summary = first line of
    * the row's text, description = the full text, layout rotating
    * on doc_id%3.
    */
  def synthIcs(df: DataFrame, idCol: String, textCol: String,
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
        val firstLine = {
          val nl = text.indexOf('\n')
          if (nl < 0) text else text.substring(0, nl)
        }
        Row.fromSeq(r.toSeq :+
          icsWrite(firstLine, text, id, (id % 3).toInt))
      }
    }(enc)
  }

  /** Per-row .vcf synthesizer (map-only). */
  def synthVcf(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
          .replace('\n', ' ')
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        Row.fromSeq(r.toSeq :+
          vcfWrite(text, "Org " + (id % 20), (id % 3).toInt))
      }
    }(enc)
  }
}
