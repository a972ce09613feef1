package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Subtitle text extraction — SubRip (.srt) and WebVTT (.vtt), the
  * two formats that carry virtually all of the web's video
  * transcripts (a conversational-speech corpus the crawl otherwise
  * yields only as opaque attachments).
  *
  * The reference repo ingests only CSV
  * (`/root/reference/src/trousse/dataset.py:341`). Both parsers here
  * are from the public specs (SRT by long-standing convention; VTT
  * per the W3C WebVTT spec):
  *
  *  - SRT: blank-line-separated blocks of `index` /
  *    `HH:MM:SS,mmm --> HH:MM:SS,mmm` / text lines. The index line
  *    is validated-but-unused (real files renumber unreliably);
  *    a block whose second line is not a timing refuses the file.
  *  - WebVTT: the `WEBVTT` signature line (optional BOM, optional
  *    trailing label), `NOTE`/`STYLE`/`REGION` blocks skipped, the
  *    optional cue-identifier line, `HH:MM:SS.mmm --> ...` timings
  *    (hours optional) with cue settings after the end stamp
  *    ignored, and cue-text tags (`<v Speaker>`, `<i>`, `<c.cls>`,
  *    `</...>`, timestamps `<00:01.000>`) stripped; the character
  *    references `&amp; &lt; &gt; &nbsp;` unescape.
  *  - Both: cues joined with one `\n` (intra-cue line breaks kept),
  *    exact total cue duration in milliseconds (end−start summed —
  *    a negative-duration cue refuses), cue census.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only,
  * no shuffle; scales with input bytes at 100 TB.
  */
object Subtitles {

  private object SubFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  /** Decoded subtitle file: cue text joined in order, cue count,
    * exact summed cue duration (ms).
    */
  final case class SubDoc(text: String, nCues: Int, durationMs: Long)

  // ---- shared timing parse -----------------------------------------

  /** `HH:MM:SS<sep>mmm` → ms; VTT allows omitting hours. */
  private def stamp(s: String, sep: Char, hoursOptional: Boolean)
      : Long = {
    val parts = s.trim.split(':')
    val (h, m, rest) = parts.length match {
      case 3 => (parts(0), parts(1), parts(2))
      case 2 if hoursOptional => ("0", parts(0), parts(1))
      case _ => throw SubFail
    }
    val di = rest.indexOf(sep)
    if (di < 0) throw SubFail
    val (sec, ms) = (rest.substring(0, di), rest.substring(di + 1))
    if (ms.length != 3) throw SubFail
    def num(x: String, maxLen: Int): Long = {
      if (x.isEmpty || x.length > maxLen ||
        !x.forall(c => c >= '0' && c <= '9')) throw SubFail
      x.toLong
    }
    val mm = num(m, 2)
    val ss = num(sec, 2)
    if (mm > 59 || ss > 59) throw SubFail
    ((num(h, 4) * 60 + mm) * 60 + ss) * 1000 + num(ms, 3)
  }

  /** `start --> end[ settings]` → (startMs, endMs). */
  private def timing(line: String, sep: Char, hoursOptional: Boolean)
      : (Long, Long) = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) throw SubFail
    val start = stamp(line.substring(0, arrow), sep, hoursOptional)
    var rest = line.substring(arrow + 3).trim
    // cue settings (`position:10%` etc.) follow the end stamp
    val sp = rest.indexWhere(c => c == ' ' || c == '\t')
    if (sp >= 0) rest = rest.substring(0, sp)
    val end = stamp(rest, sep, hoursOptional)
    if (end < start) throw SubFail
    (start, end)
  }

  private def splitLines(s: String): Array[String] =
    s.replace("\r\n", "\n").replace('\r', '\n').split("\n", -1)

  // ---- SRT ----------------------------------------------------------

  /** Parse an .srt file. None on structural damage (a block whose
    * timing line doesn't parse, negative durations, non-numeric
    * index lines).
    */
  def srtText(b: Array[Byte]): Option[SubDoc] = {
    if (b == null || b.length == 0) return None
    try {
      var s = new String(b, StandardCharsets.UTF_8)
      if (s.startsWith("﻿")) s = s.substring(1)
      val lines = splitLines(s)
      val cues = scala.collection.mutable.ArrayBuffer[String]()
      var dur = 0L
      var total = 0L
      var i = 0
      var sawCue = false
      while (i < lines.length) {
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        if (i < lines.length) {
          // index line: digits only (whitespace-trimmed)
          val idx = lines(i).trim
          if (idx.isEmpty || !idx.forall(c => c >= '0' && c <= '9'))
            throw SubFail
          i += 1
          if (i >= lines.length) throw SubFail
          val (st, en) = timing(lines(i), ',', hoursOptional = false)
          dur += en - st
          i += 1
          val text = new java.lang.StringBuilder
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (text.length > 0) text.append('\n')
            text.append(lines(i))
            i += 1
          }
          total += text.length
          if (total > MaxText) throw SubFail
          cues += text.toString
          sawCue = true
        }
      }
      if (!sawCue) throw SubFail
      Some(SubDoc(cues.mkString("\n"), cues.length, dur))
    } catch {
      case SubFail => None
      case _: NumberFormatException => None
    }
  }

  // ---- WebVTT --------------------------------------------------------

  /** Strip cue-text tags (`<...>`) and unescape the VTT character
    * references. An unterminated `<` refuses (the spec treats it as
    * an error; silently keeping it would leak markup into text).
    */
  private[graft] def stripCueTags(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val e = s.indexOf('>', i + 1)
        if (e < 0) throw SubFail
        i = e + 1
      } else if (c == '&') {
        val e = s.indexOf(';', i + 1)
        if (e < 0 || e - i > 8) { out.append(c); i += 1 }
        else {
          s.substring(i + 1, e) match {
            case "amp" => out.append('&'); i = e + 1
            case "lt" => out.append('<'); i = e + 1
            case "gt" => out.append('>'); i = e + 1
            case "nbsp" => out.append(' '); i = e + 1
            case "lrm" => out.append('‎'); i = e + 1
            case "rlm" => out.append('‏'); i = e + 1
            case _ => out.append(c); i += 1
          }
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Parse a .vtt file. None on a missing signature or structural
    * damage.
    */
  def vttText(b: Array[Byte]): Option[SubDoc] = {
    if (b == null || b.length < 6) return None
    try {
      var s = new String(b, StandardCharsets.UTF_8)
      if (s.startsWith("﻿")) s = s.substring(1)
      val lines = splitLines(s)
      // signature: "WEBVTT" alone or followed by space/tab + label
      val sig = lines(0)
      if (!(sig == "WEBVTT" || sig.startsWith("WEBVTT ") ||
        sig.startsWith("WEBVTT\t"))) return None
      val cues = scala.collection.mutable.ArrayBuffer[String]()
      var dur = 0L
      var total = 0L
      var i = 1
      while (i < lines.length) {
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        if (i < lines.length) {
          val head = lines(i)
          if (head.startsWith("NOTE") || head.startsWith("STYLE") ||
            head.startsWith("REGION")) {
            // comment/style/region block: skip to the blank line
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
          } else {
            // optional cue identifier line (no "-->"), then timing
            var timingLine = head
            if (!head.contains("-->")) {
              i += 1
              if (i >= lines.length) throw SubFail
              timingLine = lines(i)
            }
            val (st, en) = timing(timingLine, '.',
              hoursOptional = true)
            dur += en - st
            i += 1
            val text = new java.lang.StringBuilder
            while (i < lines.length && lines(i).trim.nonEmpty) {
              if (text.length > 0) text.append('\n')
              text.append(stripCueTags(lines(i)))
              i += 1
            }
            total += text.length
            if (total > MaxText) throw SubFail
            cues += text.toString
          }
        }
      }
      Some(SubDoc(cues.mkString("\n"), cues.length, dur))
    } catch {
      case SubFail => None
      case _: NumberFormatException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writers
  // ------------------------------------------------------------------

  private def srtStamp(ms: Long): String = {
    val h = ms / 3600000; val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d,$f%03d"
  }
  private def vttStamp(ms: Long): String =
    srtStamp(ms).replace(',', '.')

  /** Deterministic cue timings: cue i runs [base+2000·i,
    * base+2000·i+dur) with base = (seed%60)·1000 and
    * dur = 1500 + (seed%7)·10 — total duration is
    * nCues·(1500+(seed%7)·10), replayable in SQL.
    */
  private def cueTimes(seed: Long, i: Int): (Long, Long) = {
    val base = (seed % 60) * 1000 + 2000L * i
    (base, base + 1500 + (seed % 7) * 10)
  }

  /** A real .srt: one cue per line of `text` (a cue's text must not
    * contain blank lines — the caller flattens newlines first).
    */
  def srtWrite(cueLines: Seq[String], seed: Long): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    for ((line, i) <- cueLines.zipWithIndex) {
      val (st, en) = cueTimes(seed, i)
      sb.append(i + 1).append('\n')
      sb.append(srtStamp(st)).append(" --> ").append(srtStamp(en))
        .append('\n')
      sb.append(line).append('\n').append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** A real .vtt: signature + NOTE decoy + STYLE block, cues with
    * identifiers, cue settings, voice/italic tags, and escaped
    * `&amp;`/`&lt;` in the text (the reader must strip/unescape all
    * of it).
    */
  def vttWrite(cueLines: Seq[String], seed: Long): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("WEBVTT - graft fixture\n\n")
    sb.append("NOTE\nthis comment never reaches the text\n\n")
    sb.append("STYLE\n::cue { color: red }\n\n")
    for ((line, i) <- cueLines.zipWithIndex) {
      val (st, en) = cueTimes(seed, i)
      sb.append("cue-").append(i + 1).append('\n')
      sb.append(vttStamp(st)).append(" --> ").append(vttStamp(en))
        .append(" position:10% align:start\n")
      val escaped = line.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      sb.append("<v Speaker ").append(i + 1).append(">")
        .append("<i>").append(escaped).append("</i></v>\n\n")
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val subSchema: StructType = StructType(Seq(
    StructField("sub_text", StringType),
    StructField("n_cues", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decode kernels for [[Multimodal.decodeBatches]]. */
  def decodeSrt(bytes: Array[Byte]): Seq[Any] =
    srtText(bytes) match {
      case Some(SubDoc(t, n, d)) => Seq[Any](t, n, d)
      case None => Seq[Any](null, null, null)
    }
  def decodeVtt(bytes: Array[Byte]): Seq[Any] =
    vttText(bytes) match {
      case Some(SubDoc(t, n, d)) => Seq[Any](t, n, d)
      case None => Seq[Any](null, null, null)
    }

  /** Per-row synthesizer (map-only): the row's text flattened to two
    * cues (newlines → spaces — a cue body cannot hold blank lines),
    * timings seeded by the id column.
    */
  def synthSubs(df: DataFrame, idCol: String, textCol: String,
      outCol: String, vtt: Boolean): DataFrame = {
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
        val cues = Seq(text, "closing cue " + (id % 10))
        Row.fromSeq(r.toSeq :+
          (if (vtt) vttWrite(cues, id) else srtWrite(cues, id)))
      }
    }(enc)
  }
}
