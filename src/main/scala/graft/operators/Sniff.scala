package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Content-format sniffing by magic bytes — the dispatch layer of a
  * crawl pipeline. Declared content-types lie at scale (servers
  * mislabel, extensions are wrong, WARC records carry stale
  * metadata); routing to decoders must go by what the bytes ARE.
  * One bounded pass: leading magic, then container-interior
  * disambiguation (a ZIP is a DOCX/XLSX/PPTX/ODT/EPUB/plain-zip by
  * its directory names — via the shared ZIP64-aware walk), then a
  * text/binary fallback by UTF-8 validity. Every label corresponds
  * to a decoder implemented in this repo. Map-only, no allocation
  * beyond the directory listing for zips.
  */
object Sniff {

  /** Best-effort format label for a byte payload. */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "empty"
    // BOMs before any magic check: a UTF-8 BOM (EF BB BF) hides every
    // text-family signature from the prefix tests, and a UTF-16LE BOM
    // (FF FE) satisfies the MP3 frame-sync heuristic below and would
    // be labeled audio/mpeg. Strip/transcode and re-sniff the real
    // content (each step strictly shrinks, so this terminates).
    if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
      (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf)
      return sniff(java.util.Arrays.copyOfRange(b, 3, b.length))
    if (b.length >= 2 &&
      (((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) ||
        ((b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff))) {
      // Java's UTF-16 charset reads the BOM and picks the byte order
      val text = new String(b, StandardCharsets.UTF_16)
      return sniff(text.getBytes(StandardCharsets.UTF_8))
    }
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    def ascii(s: String, off: Int = 0): Boolean = {
      if (off + s.length > b.length) return false
      var i = 0
      while (i < s.length) {
        if ((b(off + i) & 0xff) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    // --- containers and documents
    if (ascii("%PDF-")) return "application/pdf"
    if (ascii("{\\rtf")) return "application/rtf"
    if (ascii("PK")) {
      // zip family: disambiguate by directory names
      Archive.zipEntries(b) match {
        case Some(es) =>
          val names = es.map(_.name).toSet
          if (names.contains("word/document.xml"))
            return "application/vnd.openxmlformats-officedocument" +
              ".wordprocessingml.document"
          if (names.exists(_.startsWith("xl/")))
            return "application/vnd.openxmlformats-officedocument" +
              ".spreadsheetml.sheet"
          if (names.exists(_.startsWith("ppt/")))
            return "application/vnd.openxmlformats-officedocument" +
              ".presentationml.presentation"
          if (names.contains("META-INF/container.xml"))
            return "application/epub+zip"
          if (names.contains("content.xml") &&
            names.contains("mimetype"))
            return "application/vnd.oasis.opendocument.text"
          // a manifest plus class members is a jar, not bare zip
          if (names.contains("META-INF/MANIFEST.MF") &&
            names.exists(_.endsWith(".class")))
            return "application/java-archive"
          return "application/zip"
        case None => return "application/zip-damaged"
      }
    }
    if (at(0) == 0xd0 && at(1) == 0xcf && at(2) == 0x11 &&
      at(3) == 0xe0 && at(4) == 0xa1 && at(5) == 0xb1 &&
      at(6) == 0x1a && at(7) == 0xe1)
      // legacy Office container: subtype by the directory walk
      return Cfb.cfbStreams(b).map(_.label)
        .getOrElse("application/x-cfb-damaged")
    if (ascii("SQLite format 3")) return "application/vnd.sqlite3"
    if (at(0) == 0x7f && at(1) == 'E' && at(2) == 'L' &&
      at(3) == 'F') return "application/x-elf"
    if (at(0) == 0x00 && at(1) == 'a' && at(2) == 's' &&
      at(3) == 'm') return "application/wasm"
    if (at(0) == 0xca && at(1) == 0xfe && at(2) == 0xba &&
      at(3) == 0xbe) {
      // the classic CAFEBABE collision: fat Mach-O vs Java class.
      // A fat header's next word is a tiny nfat_arch and every
      // slice must parse; a class file's is minor<<16|major with
      // major >= 45 for every JVM ever shipped.
      return if (MachO.machMeta(b).isDefined)
        "application/x-mach-binary"
      else "application/java-vm"
    }
    // thin Mach-O magics, both word sizes and endiannesses
    if (((at(0) == 0xfe && at(1) == 0xed && at(2) == 0xfa &&
      (at(3) == 0xce || at(3) == 0xcf)) ||
      ((at(0) == 0xce || at(0) == 0xcf) && at(1) == 0xfa &&
        at(2) == 0xed && at(3) == 0xfe)) &&
      MachO.machMeta(b).isDefined)
      return "application/x-mach-binary"
    // PE demands the e_lfanew hop to a real PE signature — a bare
    // MZ stub (or a DOS-era binary) stays unclassified
    if (at(0) == 'M' && at(1) == 'Z' && b.length > 0x40 && {
      val ln = (at(0x3c)) | (at(0x3d) << 8) | (at(0x3e) << 16)
      ln >= 0x40 && ln + 4 <= b.length && at(ln) == 'P' &&
        at(ln + 1) == 'E' && at(ln + 2) == 0 && at(ln + 3) == 0
    }) return "application/vnd.microsoft.portable-executable"
    if (ascii("PAR1") && b.length >= 12 &&
      ascii("PAR1", b.length - 4))
      return "application/vnd.apache.parquet"
    // bencoded torrent: a dict opener with an info key and a valid
    // full parse (the prefix alone is just text)
    if (at(0) == 'd' && at(1) >= '0' && at(1) <= '9' &&
      b.indexOfSlice("4:infod".getBytes) >= 0 &&
      Torrent.torrentMeta(b).isDefined)
      return "application/x-bittorrent"
    if (ascii("Obj") && at(3) == 1) return "application/avro"
    if (ascii("WARC/")) return "application/warc"
    if (at(0) == 0x1f && at(1) == 0x8b) return "application/gzip"
    if (at(0) == 0x1f && at(1) == 0x9d)
      return "application/x-compress"
    if (ascii("BZh") && at(3) >= '1' && at(3) <= '9')
      return "application/x-bzip2"
    if (at(0) == 0xfd && ascii("7zXZ", 1) && at(5) == 0)
      return "application/x-xz"
    if (ascii("7z") && at(2) == 0xbc && at(3) == 0xaf &&
      at(4) == 0x27 && at(5) == 0x1c)
      return "application/x-7z-compressed"
    if (ascii("Rar!") && at(4) == 0x1a && at(5) == 0x07)
      return "application/vnd.rar" // v4 (at(6)=0) and v5 (=1)
    if (ascii("MSCF") && at(4) == 0 && at(5) == 0 && at(6) == 0 &&
      at(7) == 0)
      return "application/vnd.ms-cab-compressed"
    if (at(0) == 0x28 && at(1) == 0xb5 && at(2) == 0x2f &&
      at(3) == 0xfd) return "application/zstd"
    if (at(0) == 0x04 && at(1) == 0x22 && at(2) == 0x4d &&
      at(3) == 0x18) return "application/x-lz4"
    if (at(0) == 0x02 && at(1) == 0x21 && at(2) == 0x4c &&
      at(3) == 0x18) return "application/x-lz4" // legacy frame
    if (ascii("!<arch>\n"))
      return Ar.arEntries(b) match {
        case Some(es) if Ar.isDeb(es) =>
          "application/vnd.debian.binary-package"
        case Some(_) => "application/x-archive"
        case None => "application/x-archive-damaged"
      }
    if ((ascii("070707") || ascii("070701") || ascii("070702")) &&
      b.length >= 76 && {
        // demand a digit-valid first header, not just the magic —
        // a text file can open with those six characters
        val hexOk = (6 until 76).forall { i =>
          val c = b(i)
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            (c >= 'A' && c <= 'F')
        }
        hexOk
      }) return "application/x-cpio"
    if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf &&
      at(3) == 0xa3)
      return Mkv.mkvMeta(b) match {
        case Some(m) if m.docType == "webm" => "video/webm"
        case Some(_) => "video/x-matroska"
        case None => "video/x-matroska-damaged"
      }
    // ICO/CUR: the 00 00 01|02 00 head is weak — demand a full
    // bounds-validated directory parse
    if (at(0) == 0 && at(1) == 0 && (at(2) == 1 || at(2) == 2) &&
      at(3) == 0 && Ico.icoMeta(b).isDefined)
      return "image/x-icon"
    // packet captures: all four classic magics + the pcapng SHB
    if (b.length >= 12 && {
      val m = ((at(0).toLong << 24) | (at(1).toLong << 16) |
        (at(2).toLong << 8) | at(3).toLong)
      m == 0xA1B2C3D4L || m == 0xD4C3B2A1L ||
        m == 0xA1B23C4DL || m == 0x4D3CB2A1L ||
        m == 0x0A0D0D0AL // SHB; validated by the single parse below
    } && Pcap.pcapMeta(b).isDefined)
      return "application/vnd.tcpdump.pcap"
    // certificates: PEM armor is explicit; bare DER (0x30 0x82
    // SEQUENCE) is far too weak alone, so it demands a full
    // RFC 5280 parse
    if (ascii("-----BEGIN CERTIFICATE-----") &&
      X509.certMeta(b).isDefined)
      return "application/x-pem-certificate"
    // real certs always exceed 127 bytes → long-form length 81-83
    if (at(0) == 0x30 && at(1) >= 0x81 && at(1) <= 0x83 &&
      X509.certMeta(b).isDefined)
      return "application/pkix-cert"
    // Python bytecode: a known importlib magic (xx xx 0d 0a) plus
    // a successful header+marshal walk — the 0d0a pair alone is
    // far too weak
    if (b.length >= 4 && at(2) == 0x0d && at(3) == 0x0a &&
      Pyc.MagicVersions.contains(at(0) | (at(1) << 8)) &&
      Pyc.pycFacts(b).isDefined)
      return "application/x-python-bytecode"
    // HDF5: the 8-byte signature is strong on its own
    if (at(0) == 0x89 && ascii("HDF", 1) && at(4) == '\r' &&
      at(5) == '\n' && at(6) == 0x1a && at(7) == '\n')
      return "application/x-hdf5"
    // RPM lead magic + a full parse (header structures + payload)
    if (at(0) == 0xed && at(1) == 0xab && at(2) == 0xee &&
      at(3) == 0xdb && Rpm.rpmMeta(b).isDefined)
      return "application/x-rpm"
    // git loose object: zlib CMF byte + a full inflate to the
    // "type size NUL" grammar with a verified size — nothing
    // weaker, since 0x78 alone opens every zlib stream
    if (at(0) == 0x78 && GitLoose.looseObject(b).isDefined)
      return "application/x-git-loose-object"
    // git packfile: 'PACK' + the version-2 word (bare 'PACK' text
    // stays text)
    if (ascii("PACK") && b.length >= 12 && at(4) == 0 &&
      at(5) == 0 && at(6) == 0 && at(7) == 2)
      return "application/x-git-pack"
    // GGUF model file
    if (ascii("GGUF") && Gguf.ggufMeta(b).isDefined)
      return "application/x-gguf"
    // safetensors has NO magic: a u64 header length whose JSON
    // starts with '{' — classify only on a FULL successful
    // validation (bounds + sizes + exact tiling), which stray JSON
    // or random bytes cannot pass
    if (b.length >= 9 && at(8) == '{' && b(7) == 0 &&
      SafeTensors.stMeta(b).isDefined)
      return "application/x-safetensors"
    // Arrow IPC file: ARROW1\0\0
    if (ascii("ARROW1") && b.length >= 8 && at(6) == 0 &&
      at(7) == 0) return "application/vnd.apache.arrow.file"
    // ORC: the 3-byte header magic is weak ('ORC' opens plenty of
    // text), so the label demands a successful postscript+footer
    // parse, like font/ttf below
    if (ascii("ORC") && Orc.orcMeta(b).isDefined)
      return "application/x-orc"
    // pickle protocol 2-5: \x80 + version (proto 0/1 has no frame
    // byte and stays unclassified — '(' alone is far too weak)
    if (at(0) == 0x80 && at(1) >= 2 && at(1) <= 5 &&
      Pickle.pickleCensus(b).isDefined)
      return "application/x-python-pickle"
    // NumPy array: \x93NUMPY + a sane version byte
    if (at(0) == 0x93 && ascii("NUMPY", 1) && b.length >= 8 &&
      at(6) >= 1 && at(6) <= 3) return "application/x-npy"
    if (ascii("wOFF")) return "font/woff"
    if (ascii("wOF2")) return "font/woff2"
    if (ascii("OTTO")) return "font/otf"
    // the bare sfnt version 1.0 magic is weak (00 01 00 00), so a
    // TrueType label demands a successful triage parse
    if (at(0) == 0 && at(1) == 1 && at(2) == 0 && at(3) == 0 &&
      Font.fontMeta(b).isDefined) return "font/ttf"
    // ISO 9660: a volume descriptor signature at sector 16
    if (b.length >= 17 * 2048 && ascii("CD001", 16 * 2048 + 1))
      return "application/x-iso9660-image"
    // ustar at offset 257
    if (ascii("ustar", 257)) return "application/x-tar"
    // --- images
    if (at(0) == 0x89 && ascii("PNG", 1)) return "image/png"
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff)
      return "image/jpeg"
    if (ascii("GIF87a") || ascii("GIF89a")) return "image/gif"
    if (ascii("BM") && b.length > 14) return "image/bmp"
    if (ascii("RIFF") && ascii("WEBP", 8)) return "image/webp"
    if ((ascii("II") && at(2) == 42 && at(3) == 0) ||
      (ascii("MM") && at(2) == 0 && at(3) == 42)) return "image/tiff"
    // --- audio / video
    if (ascii("RIFF") && ascii("WAVE", 8)) return "audio/wav"
    if (ascii("RIFF") && ascii("AVI ", 8)) return "video/x-msvideo"
    if (ascii("fLaC")) return "audio/flac"
    if (ascii("OggS")) return "audio/ogg"
    if (ascii("ID3") ||
      (at(0) == 0xff && (at(1) & 0xe0) == 0xe0 && b.length > 4))
      return "audio/mpeg"
    if (b.length >= 12 && ascii("ftyp", 4)) {
      // ISO-BMFF: still-image brands route to the HEIF walk, the
      // rest stays video
      val brand = new String(b, 8, 4, StandardCharsets.US_ASCII)
      return brand match {
        case "avif" | "avis" => "image/avif"
        case "heic" | "heix" | "heim" | "heis" | "hevc" | "hevx" =>
          "image/heic"
        case "mif1" | "msf1" => "image/heif"
        case _ => "video/mp4"
      }
    }
    // --- text-ish
    if (ascii("HTTP/1.") || ascii("HTTP/2")) return "message/http"
    if (ascii("From ")) return "application/mbox"
    // eml: a real header block that the MIME walk accepts
    if (looksLikeEmail(b)) return "message/rfc822"
    val head = new String(b, 0,
      math.min(b.length, 1024), StandardCharsets.ISO_8859_1)
    // BOMs were handled above (ISO-8859-1 decoding can never yield
    // U+FEFF here), so only whitespace is skipped
    val t = head.dropWhile(c => c == ' ' || c == '\t' || c == '\r' ||
      c == '\n')
    val tl = t.toLowerCase(java.util.Locale.ROOT)
    if (tl.startsWith("<!doctype html") || tl.startsWith("<html"))
      return "text/html"
    if (t.startsWith("<?xml")) {
      // dialects by the first element after decl/comments
      return xmlRootLocal(t) match {
        case "rss" => "application/rss+xml"
        case "feed" => "application/atom+xml"
        case "gpx" => "application/gpx+xml"
        case "kml" => "application/vnd.google-earth.kml+xml"
        case "urlset" | "sitemapindex" => "application/x-sitemap+xml"
        case _ => "text/xml"
      }
    }
    // vobject families announce themselves on line one
    if (t.startsWith("BEGIN:VCALENDAR")) return "text/calendar"
    if (t.startsWith("BEGIN:VCARD")) return "text/vcard"
    // WebVTT signature: WEBVTT alone or followed by space/tab/newline
    if (t.startsWith("WEBVTT") &&
      (t.length == 6 || t.charAt(6) == ' ' || t.charAt(6) == '\t' ||
        t.charAt(6) == '\n' || t.charAt(6) == '\r'))
      return "text/vtt"
    if (looksLikeSrt(t)) return "application/x-subrip"
    // markdown: YAML front matter ("---", a key: line, a closing
    // "---") — the static-site convention; markdown without front
    // matter stays text/plain (honest triage, not a guess)
    if (t.startsWith("---\n") || t.startsWith("---\r\n")) {
      val afterDash = t.indexOf('\n') + 1
      val keyEnd = t.indexOf(':', afterDash)
      val lineEnd = t.indexOf('\n', afterDash)
      if (keyEnd > afterDash && (lineEnd < 0 || keyEnd < lineEnd) &&
        t.substring(afterDash, keyEnd)
          .forall(c => c.isLetterOrDigit || c == '_' || c == '-') &&
        t.indexOf("\n---", afterDash) > 0)
        return "text/markdown"
    }
    // notebook: a JSON object whose head carries the nbformat shape
    if (t.startsWith("{") &&
      (t.contains("\"cells\"") || t.contains("\"worksheets\"")))
      return "application/x-ipynb+json"
    if (looksUtf8(b)) "text/plain" else "application/octet-stream"
  }

  /** Two-layer dispatch: unwrap TRANSPARENT compression (gzip via
    * the shared member walk, zstd via the full entropy decoder) and
    * sniff the interior — a crawl's `.tar.gz` / `.json.zst` carries
    * its real format one layer down, and routing on the outer label
    * alone sends everything to "gzip". Returns (outer, inner);
    * inner == outer for uncompressed payloads, `…-damaged` when the
    * wrapper lies about its contents.
    */
  def sniffDeep(b: Array[Byte]): (String, String) = {
    val outer = sniff(b)
    outer match {
      case "application/gzip" =>
        Archive.gunzip(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/gzip-damaged")
        }
      case "application/zstd" =>
        Zstd.decompress(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/zstd-damaged")
        }
      case "application/x-bzip2" =>
        Bzip2.decompress(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/x-bzip2-damaged")
        }
      case "application/x-xz" =>
        Xz.decompress(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/x-xz-damaged")
        }
      case "application/x-lz4" =>
        Lz4.decodeFrame(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/x-lz4-damaged")
        }
      case "application/x-compress" =>
        UnixZ.decompress(b) match {
          case Some(d) => (outer, sniff(d))
          case None => (outer, "application/x-compress-damaged")
        }
      case _ => (outer, outer)
    }
  }

  /** Local name of the first element after the XML declaration,
    * comments, PIs, and a DOCTYPE — bounded to the sniffed head.
    */
  private def xmlRootLocal(t: String): String = {
    var i = 0
    while (i < t.length) {
      val lt = t.indexOf('<', i)
      if (lt < 0) return ""
      if (t.startsWith("<!--", lt)) {
        val e = t.indexOf("-->", lt + 4)
        if (e < 0) return ""
        i = e + 3
      } else if (t.startsWith("<?", lt)) {
        val e = t.indexOf("?>", lt + 2)
        if (e < 0) return ""
        i = e + 2
      } else if (t.startsWith("<!", lt)) {
        val e = t.indexOf('>', lt + 2)
        if (e < 0) return ""
        i = e + 1
      } else {
        var e = lt + 1
        while (e < t.length && !Character.isWhitespace(t.charAt(e)) &&
          t.charAt(e) != '>' && t.charAt(e) != '/') e += 1
        val name = t.substring(lt + 1, e)
        val c = name.indexOf(':')
        return if (c >= 0) name.substring(c + 1) else name
      }
    }
    ""
  }

  /** SubRip shape over the head: a digits-only cue index line, then
    * a `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line. No magic exists
    * for SRT — this is the narrowest honest check.
    */
  private def looksLikeSrt(t: String): Boolean = {
    val nl = t.indexOf('\n')
    if (nl <= 0) return false
    val idx = t.substring(0, nl).trim
    if (idx.isEmpty || idx.length > 6 ||
      !idx.forall(c => c >= '0' && c <= '9')) return false
    val e2 = t.indexOf('\n', nl + 1)
    val timing = t.substring(nl + 1,
      if (e2 < 0) t.length else e2).trim
    val arrow = timing.indexOf(" --> ")
    arrow >= 8 && timing.length >= arrow + 5 + 8 &&
      timing.take(arrow).count(_ == ':') == 2 &&
      timing.take(arrow).contains(',')
  }

  private def looksLikeEmail(b: Array[Byte]): Boolean = {
    val head = new String(b, 0,
      math.min(b.length, 2048), StandardCharsets.ISO_8859_1)
    val lower = head.toLowerCase(java.util.Locale.ROOT)
    (lower.startsWith("from:") || lower.startsWith("subject:") ||
      lower.startsWith("received:") ||
      lower.startsWith("return-path:")) &&
      (lower.contains("\nsubject:") || lower.contains("\nfrom:") ||
        lower.startsWith("subject:") || lower.startsWith("from:")) &&
      Mime.emlText(b).isDefined
  }

  /** Strict UTF-8 validity over a bounded prefix, refusing NULs —
    * the text/binary discriminator.
    */
  private def looksUtf8(b: Array[Byte]): Boolean = {
    val n = math.min(b.length, 8192)
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c == 0) return false
      if (c < 0x80) i += 1
      else {
        val len =
          if ((c & 0xe0) == 0xc0) 2
          else if ((c & 0xf0) == 0xe0) 3
          else if ((c & 0xf8) == 0xf0) 4
          else return false
        // sequence split by the window end: accept the prefix
        if (i + len > n) return true
        var k = 1
        while (k < len) {
          if ((b(i + k) & 0xc0) != 0x80) return false
          k += 1
        }
        i += len
      }
    }
    true
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val sniffSchema: StructType = StructType(Seq(
    StructField("format", StringType)))

  def decodeSniff(bytes: Array[Byte]): Seq[Any] =
    Seq[Any](sniff(bytes))

  /** Fixture: one payload per row, the format selected by `modeCol`
    * (0..11) — each through the repo's own writer for that format.
    */
  def synthFormats(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ii, ti, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol), df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii).toString
        val pix = Array.tabulate(64)(i => (i * 4) % 256)
        val bytes: Array[Byte] = r.getInt(mi) match {
          case 0 => Pdf.pdfWrite(text, 0, 0)
          case 1 => Docx.docxWrite(text, 0)
          case 2 => Docx.xlsxWrite(Seq(text), 0)
          case 3 => Docx.pptxWrite(Seq(text), 0)
          case 4 => Docx.odtWrite(text, 0)
          case 5 => Docx.epubWrite(text, "f " + id, 0)
          case 6 => Rtf.rtfWrite(text, 0)
          case 7 => Mime.emlWrite("s " + id, text, 0)
          case 8 => Archive.gzipWrite(text.getBytes("UTF-8"), "d")
          case 9 => Archive.tarWrite(Seq(("a.txt",
            text.getBytes("UTF-8"))))
          case 10 => Multimodal.pngEncodeGray(8, 8, pix)
          case 11 => Multimodal.jpegEncodeGray(8, 8, pix)
          case 12 => Archive.zipWrite(Seq(("plain.txt",
            text.getBytes("UTF-8"), false)))
          case 13 => ("From x@y Fri Aug 15 00:00:00 2025\n" +
            "Subject: m\nContent-Type: text/plain\n\nbody\n")
            .getBytes("UTF-8")
          case 15 => Ipynb.ipynbWrite(text, "print('x')", 0)
          case 16 => Subtitles.srtWrite(
            Seq(text.replace('\n', ' '), "x"), 7L)
          case 17 => Subtitles.vttWrite(
            Seq(text.replace('\n', ' '), "x"), 7L)
          case 18 => Feed.feedWrite("f " + id,
            Seq(("t", text)), 0)
          case 19 => Feed.feedWrite("f " + id,
            Seq(("t", text)), 2)
          case 20 => Xls.xlsWrite(text, 7L)
          case 21 => Ppt.pptWrite(Seq(text, "x"))
          case _ => ("t " + id + " " + text).getBytes("UTF-8")
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  val sniffDeepSchema: StructType = StructType(Seq(
    StructField("outer_format", StringType),
    StructField("inner_format", StringType)))

  def decodeSniffDeep(bytes: Array[Byte]): Seq[Any] = {
    val (outer, inner) = sniffDeep(bytes)
    Seq[Any](outer, inner)
  }

  /** Fixture for the two-layer dispatch: compressed wrappers around
    * real interior formats, mode-selected.
    */
  def synthDeep(df: DataFrame, idCol: String, textCol: String,
      modeCol: String, outCol: String): DataFrame = {
    val (ti, mi) = (df.schema.fieldIndex(textCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val bytes: Array[Byte] = r.getInt(mi) match {
          case 0 => Archive.gzipWrite(Archive.tarWrite(Seq(
            ("doc.txt", text.getBytes("UTF-8")))), "doc.tar")
          case 1 => Archive.gzipWrite(Docx.docxWrite(text, 0), "d")
          case 2 => Zstd.encodeFrame(Feed.feedWrite("f",
            Seq(("t", text)), 0))
          case 3 => Zstd.encodeFrame(Pdf.pdfWrite(text, 0, 0))
          case 4 => Ipynb.ipynbWrite(text, "c()", 0)
          case _ => Archive.gzipWrite(Sqlite.sqliteWrite(Seq(
            (1L, 1L, text), (2L, 2L, "x"))), "db")
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }

  /** The expected label for each `synthFormats` mode — the oracle
    * replays this mapping in SQL.
    */
  val modeLabels: Seq[String] = Seq(
    "application/pdf",
    "application/vnd.openxmlformats-officedocument" +
      ".wordprocessingml.document",
    "application/vnd.openxmlformats-officedocument" +
      ".spreadsheetml.sheet",
    "application/vnd.openxmlformats-officedocument" +
      ".presentationml.presentation",
    "application/vnd.oasis.opendocument.text",
    "application/epub+zip",
    "application/rtf",
    "message/rfc822",
    "application/gzip",
    "application/x-tar",
    "image/png",
    "image/jpeg",
    "application/zip",
    "application/mbox",
    "text/plain",
    "application/x-ipynb+json",
    "application/x-subrip",
    "text/vtt",
    "application/rss+xml",
    "application/atom+xml",
    "application/vnd.ms-excel",
    "application/vnd.ms-powerpoint")
}
