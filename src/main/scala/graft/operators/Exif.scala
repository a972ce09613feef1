package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** EXIF metadata over JPEG APP1 — read AND strip. For an image
  * training corpus this is two first-class needs: orientation +
  * capture time are curation signals, and embedded GPS coordinates
  * are PII that must be REMOVED before training (the image analogue
  * of the text-side PII redaction, TextFunctions C10).
  *
  * From the public specs (JPEG/JFIF segment layout; EXIF is a TIFF
  * IFD tree inside APP1 after an `Exif` + two NULs prefix):
  *
  *  - Segment walk: SOI, then marker segments to SOS; APP1 with the
  *    Exif prefix parsed, everything else untouched.
  *  - TIFF header: II/MM byte order both supported, magic 42, IFD0.
  *  - IFD0 tags: 0x0112 Orientation, 0x0132 DateTime, 0x8825 GPS
  *    IFD pointer (followed); GPS tags 1–4 (lat/lon ref + the
  *    3-RATIONAL degree/minute/second values) read EXACTLY in
  *    centi-arc-seconds — refused (None fields) when a denominator
  *    doesn't divide cleanly, never a rounded coordinate.
  *  - [[exifStrip]] rewrites the JPEG with every Exif-APP1 segment
  *    REMOVED, all other bytes identical — entropy-coded data is
  *    never touched, so the pixels are bit-identical; a
  *    crop-and-keep-orientation pipeline must re-read metadata
  *    BEFORE stripping.
  *
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only.
  */
object Exif {

  private object ExifFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** Decoded metadata: orientation (1–8, 0 = absent), DateTime
    * string ("" = absent), GPS latitude/longitude in SIGNED
    * centi-arc-seconds from the equator/meridian (None = absent or
    * not exactly representable).
    */
  final case class ExifMeta(orientation: Int, dateTime: String,
      latCentiSec: Option[Long], lonCentiSec: Option[Long])

  // ---- JPEG segment walk ---------------------------------------------

  /** Visit JPEG marker segments: f(marker, from, until) over the
    * segment payload (excluding the 2-byte length); returns the
    * offset of SOS (entropy data follows) or the array end.
    */
  private def walkSegments(b: Array[Byte])(
      f: (Int, Int, Int) => Unit): Unit = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff ||
      (b(1) & 0xff) != 0xd8) throw ExifFail
    var p = 2
    var done = false
    while (!done && p + 4 <= b.length) {
      if ((b(p) & 0xff) != 0xff) throw ExifFail
      val marker = b(p + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7))
        p += 2 // standalone markers
      else {
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) throw ExifFail
        f(marker, p + 4, p + 2 + len)
        p += 2 + len
        if (marker == 0xda) done = true // SOS: entropy data follows
      }
    }
  }

  private def isExifApp1(b: Array[Byte], from: Int, until: Int)
      : Boolean =
    until - from >= 6 && b(from) == 'E' && b(from + 1) == 'x' &&
      b(from + 2) == 'i' && b(from + 3) == 'f' &&
      b(from + 4) == 0 && b(from + 5) == 0

  // ---- TIFF IFD walk --------------------------------------------------

  private final class Tif(b: Array[Byte], base: Int, end: Int) {
    if (end - base < 8) throw ExifFail
    private val le = (b(base) & 0xff, b(base + 1) & 0xff) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw ExifFail
    }
    def r16(o: Int): Int = {
      val a = base + o
      if (a < base || a + 2 > end) throw ExifFail
      if (le) (b(a) & 0xff) | ((b(a + 1) & 0xff) << 8)
      else ((b(a) & 0xff) << 8) | (b(a + 1) & 0xff)
    }
    def r32(o: Int): Long = {
      val a = base + o
      if (a < base || a + 4 > end) throw ExifFail
      if (le) (b(a) & 0xffL) | ((b(a + 1) & 0xffL) << 8) |
        ((b(a + 2) & 0xffL) << 16) | ((b(a + 3) & 0xffL) << 24)
      else ((b(a) & 0xffL) << 24) | ((b(a + 1) & 0xffL) << 16) |
        ((b(a + 2) & 0xffL) << 8) | (b(a + 3) & 0xffL)
    }
    if (r16(2) != 42) throw ExifFail
    def ascii(o: Int, n: Int): String = {
      val a = base + o
      // n can arrive negative (a 32-bit count wrapped by .toInt): a
      // negative length passes the a+n>end test and hands the String
      // constructor an out-of-range offset with count 0
      if (n < 0 || a < base || a + n > end) throw ExifFail
      var e = 0
      while (e < n && b(a + e) != 0) e += 1
      new String(b, a, e, StandardCharsets.US_ASCII)
    }
    /** tag → (type, count, valueOrOffset-field offset) for one IFD. */
    def ifdEntries(ifdOff: Long): Map[Int, (Int, Long, Int)] = {
      if (ifdOff < 0 || ifdOff > (end - base).toLong) throw ExifFail
      val n = r16(ifdOff.toInt)
      if (n > 512) throw ExifFail
      (0 until n).map { i =>
        val eo = ifdOff.toInt + 2 + i * 12
        val tag = r16(eo)
        val typ = r16(eo + 2)
        val count = r32(eo + 4)
        tag -> ((typ, count, eo + 8))
      }.toMap
    }
    /** SHORT/LONG scalar from an entry. */
    def scalar(e: (Int, Long, Int)): Long = e match {
      case (3, 1, vo) => r16(vo).toLong
      case (4, 1, vo) => r32(vo)
      case _ => throw ExifFail
    }
    /** ASCII value (inline when ≤4 bytes, else via offset). */
    def str(e: (Int, Long, Int)): String = e match {
      case (2, count, vo) =>
        if (count <= 4) ascii(vo, count.toInt)
        else ascii(r32(vo).toInt, count.toInt)
      case _ => throw ExifFail
    }
    /** 3 RATIONALs (deg, min, sec) → exact centi-arc-seconds. */
    def dms(e: (Int, Long, Int)): Option[Long] = e match {
      case (5, 3, vo) =>
        val off = r32(vo).toInt
        def rat(i: Int): (Long, Long) =
          (r32(off + i * 8), r32(off + i * 8 + 4))
        val (dn, dd) = rat(0)
        val (mn, md) = rat(1)
        val (sn, sd) = rat(2)
        if (dd == 0 || md == 0 || sd == 0) return None
        // centi-arc-seconds: deg·360000 + min·6000 + sec·100,
        // exact only when each term divides cleanly
        val t1 = dn * 360000L
        val t2 = mn * 6000L
        val t3 = sn * 100L
        if (t1 % dd != 0 || t2 % md != 0 || t3 % sd != 0) None
        else Some(t1 / dd + t2 / md + t3 / sd)
      case _ => None
    }
  }

  /** Read EXIF metadata from a JPEG. None when the bytes aren't a
    * JPEG or carry no Exif APP1.
    */
  def exifMeta(b: Array[Byte]): Option[ExifMeta] = {
    if (b == null || b.length < 4) return None
    try {
      var found: Option[ExifMeta] = None
      walkSegments(b) { (marker, from, until) =>
        if (marker == 0xe1 && found.isEmpty &&
          isExifApp1(b, from, until)) {
          val t = new Tif(b, from + 6, until)
          val ifd0 = t.ifdEntries(t.r32(4))
          val orientation = ifd0.get(0x0112)
            .map(t.scalar(_).toInt).getOrElse(0)
          if (orientation < 0 || orientation > 8) throw ExifFail
          val dateTime = ifd0.get(0x0132).map(t.str).getOrElse("")
          var lat: Option[Long] = None
          var lon: Option[Long] = None
          ifd0.get(0x8825).foreach { gpsPtr =>
            val gps = t.ifdEntries(t.scalar(gpsPtr))
            val latRef = gps.get(1).map(t.str).getOrElse("")
            val lonRef = gps.get(3).map(t.str).getOrElse("")
            lat = gps.get(2).flatMap(t.dms)
              .map(v => if (latRef == "S") -v else v)
            lon = gps.get(4).flatMap(t.dms)
              .map(v => if (lonRef == "W") -v else v)
          }
          found = Some(ExifMeta(orientation, dateTime, lat, lon))
        }
      }
      found
    } catch {
      case ExifFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Rewrite a JPEG with every Exif APP1 segment removed — all
    * other bytes (including entropy-coded pixels) identical. None
    * when the bytes aren't a walkable JPEG.
    */
  def exifStrip(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 4) return None
    try {
      val drop = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      walkSegments(b) { (marker, from, until) =>
        if (marker == 0xe1 && isExifApp1(b, from, until))
          drop += ((from - 4, until)) // include marker + length
      }
      if (drop.isEmpty) return Some(b)
      val out = new java.io.ByteArrayOutputStream(b.length)
      var p = 0
      for ((s, e) <- drop) {
        out.write(b, p, s - p)
        p = e
      }
      out.write(b, p, b.length - p)
      Some(out.toByteArray)
    } catch {
      case ExifFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  /** Wrap a JPEG with a real Exif APP1 (little-endian TIFF):
    * orientation + DateTime in IFD0, GPS IFD with N/E rationals —
    * seconds carry denominator 100 so centi-arc-seconds are exact.
    */
  def exifWrap(jpeg: Array[Byte], orientation: Int,
      dateTime: String, latCentiSec: Long, lonCentiSec: Long)
      : Array[Byte] = {
    require(jpeg.length > 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    require(latCentiSec >= 0 && lonCentiSec >= 0,
      "fixture plants N/E refs")
    val t = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    // TIFF header (II)
    t.write('I'); t.write('I'); w16(42); w32(8)
    val dtBytes = (dateTime + "\u0000")
      .getBytes(StandardCharsets.US_ASCII)
    // IFD0: orientation, DateTime, GPS pointer
    val ifd0At = 8
    val nIfd0 = 3
    val ifd0End = ifd0At + 2 + nIfd0 * 12 + 4
    val dtAt = ifd0End
    val gpsAt = dtAt + dtBytes.length
    w16(nIfd0)
    w16(0x0112); w16(3); w32(1); w16(orientation); w16(0)
    w16(0x0132); w16(2); w32(dtBytes.length.toLong)
    w32(dtAt.toLong)
    w16(0x8825); w16(4); w32(1); w32(gpsAt.toLong)
    w32(0) // no IFD1
    t.write(dtBytes, 0, dtBytes.length)
    // GPS IFD: latRef, lat, lonRef, lon
    val nGps = 4
    val gpsEnd = gpsAt + 2 + nGps * 12 + 4
    val latRatAt = gpsEnd
    val lonRatAt = latRatAt + 24
    w16(nGps)
    w16(1); w16(2); w32(2) // GPSLatitudeRef "N"
    t.write('N'); t.write(0); w16(0)
    w16(2); w16(5); w32(3); w32(latRatAt.toLong)
    w16(3); w16(2); w32(2) // GPSLongitudeRef "E"
    t.write('E'); t.write(0); w16(0)
    w16(4); w16(5); w32(3); w32(lonRatAt.toLong)
    w32(0)
    def rats(centiSec: Long): Unit = {
      val deg = centiSec / 360000L
      val min = (centiSec % 360000L) / 6000L
      val centi = centiSec % 6000L // hundredths of arc-seconds
      w32(deg); w32(1)
      w32(min); w32(1)
      w32(centi); w32(100)
    }
    rats(latCentiSec); rats(lonCentiSec)
    val tiff = t.toByteArray
    val app1 = new java.io.ByteArrayOutputStream()
    app1.write(0xff); app1.write(0xe1)
    val len = 2 + 6 + tiff.length
    app1.write((len >> 8) & 0xff); app1.write(len & 0xff)
    app1.write("Exif".getBytes(StandardCharsets.US_ASCII), 0, 4)
    app1.write(0); app1.write(0)
    app1.write(tiff, 0, tiff.length)
    val seg = app1.toByteArray
    val out = new Array[Byte](jpeg.length + seg.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(seg, 0, out, 2, seg.length)
    System.arraycopy(jpeg, 2, out, 2 + seg.length,
      jpeg.length - 2)
    out
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val exifSchema: StructType = StructType(Seq(
    StructField("orientation", IntegerType),
    StructField("date_time", StringType),
    StructField("lat_centisec", LongType),
    StructField("lon_centisec", LongType),
    StructField("strip_clean", BooleanType)))

  /** Decode kernel: metadata + proof the strip removes it (the
    * stripped bytes re-read as metadata-free AND stay a JPEG of
    * identical entropy data).
    */
  def decodeExif(bytes: Array[Byte]): Seq[Any] =
    exifMeta(bytes) match {
      case Some(ExifMeta(o, dt, lat, lon)) =>
        val clean = exifStrip(bytes) match {
          case Some(s) => exifMeta(s).isEmpty && s.length < bytes.length
          case None => false
        }
        Seq[Any](o, dt, lat.map(Long.box).orNull,
          lon.map(Long.box).orNull, clean)
      case None => Seq[Any](null, null, null, null, null)
    }

  /** Per-row synthesizer (map-only): an 8×8 gray JPEG wrapped with
    * id-derived orientation/timestamp/GPS.
    */
  def synthExif(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
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
        val pix = Array.tabulate(64)(i => ((i * 7 + id) % 256).toInt)
        val jpeg = Multimodal.jpegEncodeGray(8, 8, pix)
        val lat = (id % 90) * 360000L + (id % 60) * 6000L +
          (id % 6000)
        val lon = (id % 180) * 360000L + (id % 60) * 6000L +
          (id % 6000)
        val dt = f"2026:08:15 ${id % 24}%02d:${id % 60}%02d:00"
        Row.fromSeq(r.toSeq :+ exifWrap(jpeg,
          1 + (id % 8).toInt, dt, lat, lon))
      }
    }(enc)
  }
}
