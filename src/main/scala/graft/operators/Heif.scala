package graft.operators

import org.apache.spark.sql.types._

/** HEIF/HEIC/AVIF still-image triage over the ISO-BMFF box walk
  * (ISO 23008-12 on top of ISO 14496-12 — the same container
  * [[Multimodal.mp4Meta]] already parses for video): `ftyp` brand,
  * then `meta` → `pitm` (primary item), `iinf` (item type), `iprp/
  * ipco` (property containers) + `iprp/ipma` (item→property
  * associations) resolved to the PRIMARY item's `ispe` spatial
  * extents and `pixi` channel count.
  *
  * This is the dims tier only — the fastest-growing image formats
  * become visible to size/aspect curation filters without any pixel
  * decode (HEVC/AV1 payload decoding stays out of scope, same
  * honest boundary as generic video frames). Resolution goes
  * through `pitm`+`ipma`, NOT "first ispe in ipco": real files list
  * thumbnail properties first, and the wrong answer would poison
  * every aspect-ratio filter downstream.
  *
  * Totality: None for anything structurally damaged; a missing
  * `pixi` yields −1 channels, a primary item without `ispe`
  * refuses (dims are the whole point).
  */
object Heif {

  final case class HeifMeta(brand: String, itemType: String,
      width: Int, height: Int, nChannels: Int, nItems: Int)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def cc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  private val HeifBrands = Set("heic", "heix", "heim", "heis",
    "hevc", "hevx", "mif1", "msf1", "avif", "avis")

  /** Walk boxes in [from,to) invoking f(type, bodyFrom, bodyTo);
    * returns false on structural damage.
    */
  private def walk(b: Array[Byte], from: Long, to: Long)(
      f: (String, Long, Long) => Boolean): Boolean = {
    var p = from
    while (p < to) {
      if (p + 8 > to) return false
      var size = be32(b, p.toInt)
      val typ = cc(b, p.toInt + 4)
      var hdr = 8L
      if (size == 1) {
        if (p + 16 > to) return false
        size = (be32(b, p.toInt + 8) << 32) | be32(b, p.toInt + 12)
        hdr = 16L
      } else if (size == 0) size = to - p
      // overflow-safe: a crafted 64-bit size near 2^63 would wrap
      // `p + size` negative and slip past both bounds checks
      if (size < hdr || size > to - p) return false
      if (!f(typ, p + hdr, p + size)) return false
      p += size
    }
    true
  }

  /** Parse a HEIF-family image. None for non-HEIF brands (an `isom`
    * video should stay a video) or structural damage.
    */
  def heifMeta(b: Array[Byte]): Option[HeifMeta] =
    try heifMeta0(b)
    catch { // totality: structural damage refuses, never crashes
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def heifMeta0(b: Array[Byte]): Option[HeifMeta] = {
    if (b == null || b.length < 24) return None
    if (cc(b, 4) != "ftyp") return None
    val brand = cc(b, 8)
    if (!HeifBrands.contains(brand)) return None
    var primary = -1L
    var nItems = 0
    var itemType: String = null
    // ipco children in order (1-based indices for ipma)
    var props = Vector.empty[(String, Long, Long)]
    // ALL ipma associations, keyed by item id — ipma may legally
    // precede pitm inside meta, so the primary item's properties
    // are resolved only after the walk completes
    var assocs = Map.empty[Long, Vector[Int]]
    var sawMeta = false
    var itemTypes = Map.empty[Long, String]

    def parseIpma(from: Long, to: Long): Boolean = {
      if (from + 8 > to) return false
      val version = b(from.toInt) & 0xff
      val flags = be32(b, from.toInt) & 0xffffff
      val count = be32(b, from.toInt + 4)
      if (count > 10000) return false
      var p = from + 8
      var i = 0L
      while (i < count) {
        if (p + (if (version < 1) 2 else 4) + 1 > to) return false
        val itemId =
          if (version < 1) { val v = be16(b, p.toInt); p += 2; v }
          else { val v = be32(b, p.toInt); p += 4; v }
        if (p >= to) return false
        val assocCount = b(p.toInt) & 0xff
        p += 1
        var j = 0
        var mine = Vector.empty[Int]
        while (j < assocCount) {
          val wide = (flags & 1) != 0
          if (p + (if (wide) 2 else 1) > to) return false
          val idx =
            if (wide) be16(b, p.toInt) & 0x7fff
            else b(p.toInt) & 0x7f
          p += (if (wide) 2 else 1)
          mine :+= idx
          j += 1
        }
        assocs += (itemId.toLong -> mine)
        i += 1
      }
      true
    }

    def parseIinf(from: Long, to: Long): Boolean = {
      if (from + 4 > to) return false
      val version = b(from.toInt) & 0xff
      val countLen = if (version == 0) 2 else 4
      if (from + 4 + countLen > to) return false
      val count =
        if (version == 0) be16(b, (from + 4).toInt).toLong
        else be32(b, (from + 4).toInt)
      if (count > 10000) return false
      nItems = count.toInt
      // infe children carry (item_id, item_type)
      walk(b, from + 4 + countLen, to) { (t, f2, t2) =>
        if (t == "infe" && f2 + 8 <= t2) {
          val v = b(f2.toInt) & 0xff
          if (v >= 2) {
            val id =
              if (v == 2) be16(b, f2.toInt + 4).toLong
              else be32(b, f2.toInt + 4)
            val typOff = f2 + (if (v == 2) 8 else 10)
            if (typOff + 4 <= t2)
              itemTypes += (id -> cc(b, typOff.toInt))
          }
        }
        true
      }
    }

    val ok = walk(b, 0L, b.length.toLong) { (typ, from, to) =>
      typ match {
        case "meta" =>
          sawMeta = true
          // meta is a FULL box: 4 bytes version/flags
          if (from + 4 > to) false
          else walk(b, from + 4, to) { (t1, f1, t1to) =>
            t1 match {
              case "pitm" =>
                if (f1 + 6 > t1to) false
                else {
                  val v = b(f1.toInt) & 0xff
                  primary =
                    if (v == 0) be16(b, f1.toInt + 4).toLong
                    else be32(b, f1.toInt + 4)
                  true
                }
              case "iinf" => parseIinf(f1, t1to)
              case "iprp" =>
                walk(b, f1, t1to) { (t2, f2, t2to) =>
                  t2 match {
                    case "ipco" =>
                      walk(b, f2, t2to) { (t3, f3, t3to) =>
                        props :+= ((t3, f3, t3to)); true
                      }
                    case "ipma" => parseIpma(f2, t2to)
                    case _ => true
                  }
                }
              case _ => true
            }
          }
        case _ => true
      }
    }
    if (!ok || !sawMeta || primary < 0) return None
    itemType = itemTypes.getOrElse(primary, null)
    // resolve the PRIMARY item's ispe/pixi through its associations
    var width = -1
    var height = -1
    var channels = -1
    assocs.getOrElse(primary, Vector.empty).foreach { idx =>
      if (idx >= 1 && idx <= props.length) {
        val (t, f, to) = props(idx - 1)
        if (t == "ispe" && f + 12 <= to) {
          width = be32(b, f.toInt + 4).toInt
          height = be32(b, f.toInt + 8).toInt
        } else if (t == "pixi" && f + 5 <= to) {
          channels = b(f.toInt + 4) & 0xff
        }
      }
    }
    if (width <= 0 || height <= 0) return None
    Some(HeifMeta(brand, itemType, width, height, channels, nItems))
  }

  // ------------------------------------------------------------------
  // fixture writer (hand-built per ISO 23008-12 §6; no reference
  // HEIF muxer exists in this environment — the layout is pinned by
  // the spec's box diagrams and cross-checked by the thumbnail-trap
  // test: a decoy ispe listed FIRST in ipco must not win)
  // ------------------------------------------------------------------

  /** Minimal-but-honest HEIF: ftyp + meta(pitm, iinf, iprp(ipco with
    * a decoy thumbnail ispe at index 1, the primary ispe and pixi
    * after), ipma) + mdat placeholder. Exercises exactly the
    * resolution logic production files need.
    */
  def write(brand: String, itemType: String, w: Int, h: Int,
      channels: Int, nItems: Int, ipmaFirst: Boolean = false)
      : Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt)
      bb.write((v & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bb.write((v >> 8) & 0xff)
      bb.write(v & 0xff) }
    def tag(s: String): Unit = s.foreach(c => bb.write(c.toInt))
    def box(t: String)(body: => Unit): Unit = {
      val at = bb.size()
      u32(0); tag(t)
      body
      val raw = bb.toByteArray
      val size = raw.length - at
      raw(at) = ((size >> 24) & 0xff).toByte
      raw(at + 1) = ((size >> 16) & 0xff).toByte
      raw(at + 2) = ((size >> 8) & 0xff).toByte
      raw(at + 3) = (size & 0xff).toByte
      bb.reset(); bb.write(raw, 0, raw.length)
    }
    def writePitm(): Unit =
      box("pitm") { u32(0); u16(1) } // primary item_id 1
    def writeIinf(): Unit =
      box("iinf") {
        u32(0); u16(nItems)
        var i = 0
        while (i < nItems) {
          box("infe") {
            bb.write(2); bb.write(0); u16(0) // version 2
            u16(i + 1); u16(0)
            tag(if (i == 0) itemType else "thmb")
            bb.write(0) // empty name
          }
          i += 1
        }
      }
    def writeIprp(): Unit =
      box("iprp") {
        box("ipco") {
          // index 1: DECOY thumbnail ispe — first-wins would be wrong
          box("ispe") { u32(0); u32(160); u32(90) }
          // index 2: primary ispe
          box("ispe") { u32(0); u32(w.toLong); u32(h.toLong) }
          // index 3: pixi
          box("pixi") { u32(0); bb.write(channels)
            (0 until channels).foreach(_ => bb.write(8)) }
        }
        box("ipma") {
          u32(0) // version 0, narrow indices
          u32(if (nItems > 1) 2 else 1)
          // item 1 → props 2 (ispe) + 3 (pixi)
          u16(1); bb.write(2); bb.write(0x80 | 2); bb.write(3)
          if (nItems > 1) { u16(2); bb.write(1); bb.write(0x80 | 1) }
        }
      }
    box("ftyp") { tag(brand); u32(0); tag("mif1"); tag(brand) }
    box("meta") {
      u32(0) // full box version/flags
      box("hdlr") { u32(0); u32(0); tag("pict"); u32(0); u32(0)
        u32(0); bb.write(0) }
      // both child orders are legal ISO-BMFF; real muxers emit both
      if (ipmaFirst) { writeIprp(); writePitm(); writeIinf() }
      else { writePitm(); writeIinf(); writeIprp() }
    }
    box("mdat") { tag("  ") }
    bb.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val heifSchema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("item_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_items", IntegerType)))

  def decodeHeif(bytes: Array[Byte]): Seq[Any] =
    heifMeta(bytes) match {
      case Some(m) => Seq[Any](m.brand, m.itemType, m.width,
        m.height, m.nChannels, m.nItems)
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-row synthesizer: alternating heic/avif brands with planted
    * dims/channels derived from id columns.
    */
  def synthHeifs(df: org.apache.spark.sql.DataFrame, wCol: String,
      hCol: String, brandCol: String, nCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val (wi, hi, bi, ni) = (df.schema.fieldIndex(wCol),
      df.schema.fieldIndex(hCol), df.schema.fieldIndex(brandCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val avif = r.getInt(bi) == 1
        val bytes = write(if (avif) "avif" else "heic",
          if (avif) "av01" else "hvc1", r.getInt(wi), r.getInt(hi),
          3, r.getInt(ni))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
