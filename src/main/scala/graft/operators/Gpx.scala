package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** GPS track extraction — GPX (the open GPS-exchange XML) and KML
  * (Google Earth) — the geodata layer of a crawl (fitness traces,
  * hiking routes, mapping mashups). Location traces are also PII:
  * a pipeline must be able to FIND them before deciding to keep,
  * coarsen, or drop (the vector analogue of the EXIF GPS strip,
  * C185).
  *
  * Rides the shared XML event scanner ([[Docx.scanXml]]):
  *
  *  - GPX: `<trk><name>` and every `<trkpt lat=".." lon="..">`
  *    in document order (`<wpt>`/`<rtept>` carry the same shape and
  *    are counted separately); KML: `<Placemark><name>` and the
  *    whitespace-separated `lon,lat[,ele]` triples inside
  *    `<coordinates>`.
  *  - Coordinates parse as EXACT micro-degrees by decimal string
  *    math (≤6 fractional digits, sign, bounds ±90/±180 checked) —
  *    never a float round-trip; >6-digit inputs truncate toward
  *    zero the way fixed-point GIS stores do, and a malformed
  *    number refuses the file.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Gpx {

  private object GpxFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** One decoded trace: name, point count, exact micro-degree sums
    * (the oracle-checkable aggregate), bounding box in
    * micro-degrees.
    */
  final case class Trace(name: String, nPoints: Int,
      latMicroSum: Long, lonMicroSum: Long,
      latMin: Long, latMax: Long, lonMin: Long, lonMax: Long)

  /** Decimal-string degrees → exact micro-degrees. */
  private[graft] def microDeg(s0: String, bound: Long): Long = {
    val s = s0.trim
    if (s.isEmpty) throw GpxFail
    var i = 0
    var neg = false
    if (s.charAt(0) == '-' || s.charAt(0) == '+') {
      neg = s.charAt(0) == '-'
      i = 1
    }
    var intPart = 0L
    var sawDigit = false
    while (i < s.length && s.charAt(i) != '.') {
      val c = s.charAt(i)
      if (c < '0' || c > '9') throw GpxFail
      intPart = intPart * 10 + (c - '0')
      if (intPart > 1000L) throw GpxFail // way past any degree
      sawDigit = true
      i += 1
    }
    var frac = 0L
    var digits = 0
    if (i < s.length && s.charAt(i) == '.') {
      i += 1
      while (i < s.length && digits < 6) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') throw GpxFail
        frac = frac * 10 + (c - '0')
        digits += 1
        i += 1
        sawDigit = true
      }
      // beyond micro precision: truncate, but the rest must be digits
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') throw GpxFail
        i += 1
      }
    }
    if (!sawDigit) throw GpxFail
    while (digits < 6) { frac *= 10; digits += 1 }
    val v = intPart * 1000000L + frac
    val signed = if (neg) -v else v
    if (signed < -bound || signed > bound) throw GpxFail
    signed
  }

  /** Parse a GPX document. None for non-GPX roots or malformed
    * coordinates.
    */
  def gpxTrace(b: Array[Byte]): Option[Trace] = {
    if (b == null || b.length < 6) return None
    try {
      val xml = new String(b, StandardCharsets.UTF_8)
      val stack = scala.collection.mutable.ArrayBuffer[String]()
      var rootSeen = false
      var name: String = ""
      var inTrkName = false
      var n = 0
      var latSum = 0L; var lonSum = 0L
      var latMin = Long.MaxValue; var latMax = Long.MinValue
      var lonMin = Long.MaxValue; var lonMax = Long.MinValue
      def local(nm: String): String = {
        val c = nm.indexOf(':')
        if (c >= 0) nm.substring(c + 1) else nm
      }
      Docx.scanXml(xml) { ev =>
        ev match {
          case Docx.Open(raw, selfClose, attrs) =>
            val nm = local(raw)
            if (!rootSeen) {
              if (nm != "gpx") throw Docx.DocxFail("not gpx")
              rootSeen = true
            }
            if (nm == "trkpt" || nm == "wpt" || nm == "rtept") {
              val am = Docx.attrMap(attrs)
              val lat = microDeg(am.getOrElse("lat",
                throw Docx.DocxFail("no lat")), 90000000L)
              val lon = microDeg(am.getOrElse("lon",
                throw Docx.DocxFail("no lon")), 180000000L)
              n += 1
              latSum += lat; lonSum += lon
              latMin = math.min(latMin, lat)
              latMax = math.max(latMax, lat)
              lonMin = math.min(lonMin, lon)
              lonMax = math.max(lonMax, lon)
            }
            if (!selfClose) {
              stack += nm
              if (nm == "name" && stack.length >= 2 &&
                stack(stack.length - 2) == "trk") inTrkName = true
            }
          case Docx.Close(_) =>
            if (stack.nonEmpty) {
              if (stack.last == "name") inTrkName = false
              stack.remove(stack.length - 1)
            }
          case Docx.Text(s, raw0) =>
            if (inTrkName)
              name += (if (raw0) s else Docx.xmlUnescape(s))
        }
      }
      if (!rootSeen) return None
      if (n == 0) Some(Trace(name, 0, 0L, 0L, 0L, 0L, 0L, 0L))
      else Some(Trace(name, n, latSum, lonSum, latMin, latMax,
        lonMin, lonMax))
    } catch {
      case Docx.DocxFail(_) => None
      case GpxFail => None
    }
  }

  /** Parse a KML document (Placemark name + `<coordinates>`
    * lon,lat[,ele] triples). None for non-KML roots or malformed
    * coordinates.
    */
  def kmlTrace(b: Array[Byte]): Option[Trace] = {
    if (b == null || b.length < 6) return None
    try {
      val xml = new String(b, StandardCharsets.UTF_8)
      val stack = scala.collection.mutable.ArrayBuffer[String]()
      var rootSeen = false
      var name: String = ""
      var inName = false
      var coordText = new java.lang.StringBuilder
      var inCoords = false
      def local(nm: String): String = {
        val c = nm.indexOf(':')
        if (c >= 0) nm.substring(c + 1) else nm
      }
      Docx.scanXml(xml) { ev =>
        ev match {
          case Docx.Open(raw, selfClose, _) =>
            val nm = local(raw)
            if (!rootSeen) {
              if (nm != "kml") throw Docx.DocxFail("not kml")
              rootSeen = true
            }
            if (!selfClose) {
              stack += nm
              if (nm == "name" && stack.contains("Placemark"))
                inName = true
              if (nm == "coordinates") inCoords = true
            }
          case Docx.Close(_) =>
            if (stack.nonEmpty) {
              if (stack.last == "name") inName = false
              if (stack.last == "coordinates") inCoords = false
              stack.remove(stack.length - 1)
            }
          case Docx.Text(s, raw0) =>
            val t = if (raw0) s else Docx.xmlUnescape(s)
            if (inName) name += t
            if (inCoords) coordText.append(t)
        }
      }
      if (!rootSeen) return None
      var n = 0
      var latSum = 0L; var lonSum = 0L
      var latMin = Long.MaxValue; var latMax = Long.MinValue
      var lonMin = Long.MaxValue; var lonMax = Long.MinValue
      for (tok <- coordText.toString.split("\\s+") if tok.nonEmpty) {
        val parts = tok.split(",")
        if (parts.length < 2) throw GpxFail
        val lon = microDeg(parts(0), 180000000L)
        val lat = microDeg(parts(1), 90000000L)
        n += 1
        latSum += lat; lonSum += lon
        latMin = math.min(latMin, lat)
        latMax = math.max(latMax, lat)
        lonMin = math.min(lonMin, lon)
        lonMax = math.max(lonMax, lon)
      }
      if (n == 0) Some(Trace(name, 0, 0L, 0L, 0L, 0L, 0L, 0L))
      else Some(Trace(name, n, latSum, lonSum, latMin, latMax,
        lonMin, lonMax))
    } catch {
      case Docx.DocxFail(_) => None
      case GpxFail => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writers
  // ------------------------------------------------------------------

  private def fmtMicro(micro: Long): String = {
    val sign = if (micro < 0) "-" else ""
    val a = math.abs(micro)
    f"$sign${a / 1000000L}%d.${a % 1000000L}%06d"
  }

  /** Deterministic point i of `seed`: lat/lon in micro-degrees —
    * modulo-free affine forms so the oracle can replay the SUMS in
    * closed form (lat ≈ 10–11°, lon ≈ −20–−22°, well inside
    * bounds for any doc_id).
    */
  private[graft] def point(seed: Long, i: Int): (Long, Long) = {
    val lat = 10000000L + (seed % 1000000L) + 1000L * i
    val lon = -(20000000L + (seed % 2000000L) + 1000L * i)
    (lat, lon)
  }

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A real GPX track: `nPts` trkpts + a wpt, name + decoys. */
  def gpxWrite(name: String, seed: Long, nPts: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<gpx version=\"1.1\" creator=\"graft\">\n")
    sb.append("<metadata><name>file-level decoy</name></metadata>\n")
    sb.append("<trk><name>").append(esc(name))
      .append("</name>\n<trkseg>\n")
    for (i <- 0 until nPts) {
      val (lat, lon) = point(seed, i)
      sb.append("<trkpt lat=\"").append(fmtMicro(lat))
        .append("\" lon=\"").append(fmtMicro(lon)).append("\">")
      sb.append("<ele>12.5</ele><time>2026-08-15T00:00:00Z</time>")
      sb.append("</trkpt>\n")
    }
    sb.append("</trkseg></trk>\n")
    val (wlat, wlon) = point(seed, nPts)
    sb.append("<wpt lat=\"").append(fmtMicro(wlat))
      .append("\" lon=\"").append(fmtMicro(wlon))
      .append("\"><name>a waypoint</name></wpt>\n")
    sb.append("</gpx>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** A real KML placemark with a LineString. */
  def kmlWrite(name: String, seed: Long, nPts: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<kml xmlns=\"http://www.opengis.net/kml/2.2\">\n")
    sb.append("<Document><Placemark><name>")
      .append(esc(name)).append("</name>\n")
    sb.append("<LineString><coordinates>\n")
    for (i <- 0 until nPts) {
      val (lat, lon) = point(seed, i)
      sb.append(fmtMicro(lon)).append(',').append(fmtMicro(lat))
        .append(",0\n")
    }
    sb.append("</coordinates></LineString>")
    sb.append("</Placemark></Document></kml>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val traceSchema: StructType = StructType(Seq(
    StructField("trace_name", StringType),
    StructField("n_points", IntegerType),
    StructField("lat_micro_sum", LongType),
    StructField("lon_micro_sum", LongType)))

  def decodeGpx(bytes: Array[Byte]): Seq[Any] =
    gpxTrace(bytes) match {
      case Some(t) =>
        Seq[Any](t.name, t.nPoints, t.latMicroSum, t.lonMicroSum)
      case None => Seq[Any](null, null, null, null)
    }
  def decodeKml(bytes: Array[Byte]): Seq[Any] =
    kmlTrace(bytes) match {
      case Some(t) =>
        Seq[Any](t.name, t.nPoints, t.latMicroSum, t.lonMicroSum)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row synthesizer (map-only): GPX on even ids, KML on odd —
    * the decode kernel column says which parser ran.
    */
  def synthGeo(df: DataFrame, idCol: String, outCol: String,
      kml: Boolean): DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val nPts = 3 + (id % 5).toInt
        val bytes =
          if (kml) kmlWrite("route " + (id % 40), id, nPts)
          else gpxWrite("route " + (id % 40), id, nPts)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
