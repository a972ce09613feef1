package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Bencode parsing and .torrent metadata (both public formats:
  * BEP 3, the BitTorrent metainfo spec). Torrents circulate inside
  * web crawls; the canonical dedup key for them is the INFOHASH —
  * the SHA-1 of the `info` dictionary's EXACT bencoded byte span in
  * the source (not a re-encode: a re-encoder that reorders keys or
  * normalizes integers computes a different, useless hash), so the
  * parser records byte spans for every value.
  *
  * Surfaced: name, piece length, piece count (the `pieces` blob is
  * validated as a multiple of 20 bytes), file count and total
  * length in both the single-file (`length`) and multi-file
  * (`files` list) layouts, plus the hex infohash.
  *
  * Totality: None on damage — bencode demands canonical form here
  * (sorted unique dict keys, no leading zeros, `i-0e` refused), so
  * two byte-distinct torrents cannot parse to one identity.
  * Scale: per-value, map-only; infohash dedup is the exact-dedup
  * groupBy pattern.
  */
object Torrent {

  private val MaxDepth = 32
  private val MaxItems = 100000

  /** A parsed bencode value with its byte span [from, until). */
  sealed trait BVal { def from: Int; def until: Int }
  final case class BInt(v: Long, from: Int, until: Int) extends BVal
  final case class BStr(v: Array[Byte], from: Int, until: Int)
      extends BVal
  final case class BList(v: Vector[BVal], from: Int, until: Int)
      extends BVal
  final case class BDict(v: Vector[(String, BVal)], from: Int,
      until: Int) extends BVal

  private final case class Fail() extends RuntimeException

  /** Parse one bencode value at `p`; canonical form enforced. */
  private def parse(b: Array[Byte], p0: Int, depth: Int,
      budget: Array[Int]): BVal = {
    if (depth > MaxDepth) throw Fail()
    budget(0) -= 1
    if (budget(0) < 0) throw Fail()
    if (p0 >= b.length) throw Fail()
    b(p0) match {
      case 'i' =>
        var p = p0 + 1
        val neg = p < b.length && b(p) == '-'
        if (neg) p += 1
        val ds = p
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
        if (p == ds || p >= b.length || b(p) != 'e') throw Fail()
        // canonical: no leading zeros (except "0" itself), no -0
        if (b(ds) == '0' && (p - ds > 1 || neg)) throw Fail()
        val s = new String(b, p0 + 1, p - p0 - 1,
          java.nio.charset.StandardCharsets.US_ASCII)
        val v = try s.toLong
          catch { case _: NumberFormatException => throw Fail() }
        BInt(v, p0, p + 1)
      case 'l' =>
        var p = p0 + 1
        val items = Vector.newBuilder[BVal]
        while (p < b.length && b(p) != 'e') {
          val x = parse(b, p, depth + 1, budget)
          items += x
          p = x.until
        }
        if (p >= b.length) throw Fail()
        BList(items.result(), p0, p + 1)
      case 'd' =>
        var p = p0 + 1
        val items = Vector.newBuilder[(String, BVal)]
        var lastKey: Array[Byte] = null
        while (p < b.length && b(p) != 'e') {
          val k = parse(b, p, depth + 1, budget) match {
            case s: BStr => s
            case _ => throw Fail() // keys are strings
          }
          // canonical: strictly ascending raw-byte key order
          if (lastKey != null &&
            java.util.Arrays.compareUnsigned(lastKey, k.v) >= 0)
            throw Fail()
          lastKey = k.v
          val v = parse(b, k.until, depth + 1, budget)
          items += ((new String(k.v,
            java.nio.charset.StandardCharsets.UTF_8), v))
          p = v.until
        }
        if (p >= b.length) throw Fail()
        BDict(items.result(), p0, p + 1)
      case c if c >= '0' && c <= '9' =>
        var p = p0
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
        if (p >= b.length || b(p) != ':') throw Fail()
        if (b(p0) == '0' && p - p0 > 1) throw Fail()
        val len = new String(b, p0, p - p0,
          java.nio.charset.StandardCharsets.US_ASCII).toLong
        if (len < 0 || len > b.length - p - 1) throw Fail()
        val from = p + 1
        BStr(java.util.Arrays.copyOfRange(b, from,
          from + len.toInt), p0, from + len.toInt)
      case _ => throw Fail()
    }
  }

  /** Parse a complete bencode document (no trailing bytes). */
  def bdecode(b: Array[Byte]): Option[BVal] = {
    if (b == null || b.length == 0) return None
    try {
      val v = parse(b, 0, 0, Array(MaxItems))
      if (v.until != b.length) None else Some(v)
    } catch {
      case _: Fail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  final case class TorrentMeta(name: String, pieceLength: Long,
      nPieces: Int, nFiles: Int, totalLength: Long,
      infohash: String)

  private def hex(d: Array[Byte]): String =
    d.map(x => f"${x & 0xff}%02x").mkString

  /** Parse a .torrent. None unless the BEP 3 required fields are
    * present and consistent.
    */
  def torrentMeta(b: Array[Byte]): Option[TorrentMeta] = {
    val root = bdecode(b) match {
      case Some(d: BDict) => d
      case _ => return None
    }
    val info = root.v.collectFirst {
      case ("info", d: BDict) => d
    }.getOrElse(return None)
    def field(d: BDict, k: String): Option[BVal] =
      d.v.collectFirst { case (`k`, v) => v }
    val name = field(info, "name") match {
      case Some(s: BStr) => new String(s.v,
        java.nio.charset.StandardCharsets.UTF_8)
      case _ => return None
    }
    val pieceLen = field(info, "piece length") match {
      case Some(i: BInt) if i.v > 0 => i.v
      case _ => return None
    }
    val nPieces = field(info, "pieces") match {
      case Some(s: BStr) if s.v.length % 20 == 0 => s.v.length / 20
      case _ => return None
    }
    val (nFiles, total) = field(info, "files") match {
      case Some(l: BList) =>
        var t = 0L
        for (f <- l.v) f match {
          case d: BDict => field(d, "length") match {
            case Some(i: BInt) if i.v >= 0 => t += i.v
            case _ => return None
          }
          case _ => return None
        }
        (l.v.length, t)
      case Some(_) => return None
      case None => field(info, "length") match {
        case Some(i: BInt) if i.v >= 0 => (1, i.v)
        case _ => return None
      }
    }
    // the infohash is the SHA-1 over the info dict's EXACT bytes
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(b, info.from, info.until - info.from)
    Some(TorrentMeta(name, pieceLen, nPieces, nFiles, total,
      hex(md.digest())))
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  /** Bencode with canonical (byte-sorted) dict keys. */
  def bencode(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def go(x: Any): Unit = x match {
      case i: Long => put(s"i${i}e")
      case i: Int => put(s"i${i}e")
      case s: String =>
        val d = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        put(s"${d.length}:"); out.write(d, 0, d.length)
      case d: Array[Byte] =>
        put(s"${d.length}:"); out.write(d, 0, d.length)
      case l: Seq[_] => put("l"); l.foreach(go); put("e")
      case m: Map[_, _] =>
        put("d")
        import scala.math.Ordering.Implicits._
        m.asInstanceOf[Map[String, Any]].toSeq
          .sortBy(_._1.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)
            .map(_ & 0xff).toSeq)
          .foreach { case (k, vv) => go(k); go(vv) }
        put("e")
      case _ => throw new IllegalArgumentException(
        x.getClass.getName)
    }
    go(v)
    out.toByteArray
  }

  /** A single- or multi-file torrent with deterministic pieces. */
  def torrentWrite(name: String, pieceLength: Long,
      fileLengths: Seq[Long], seed: Long): Array[Byte] = {
    val total = fileLengths.sum
    val nPieces = math.max(1, (total + pieceLength - 1) /
      pieceLength).toInt
    val pieces = new Array[Byte](nPieces * 20)
    var x = seed
    for (i <- pieces.indices) {
      x = x * 6364136223846793005L + 1442695040888963407L
      pieces(i) = (x >>> 33).toByte
    }
    val info: Map[String, Any] =
      if (fileLengths.length == 1) Map(
        "name" -> name, "piece length" -> pieceLength,
        "pieces" -> pieces, "length" -> fileLengths.head)
      else Map(
        "name" -> name, "piece length" -> pieceLength,
        "pieces" -> pieces,
        "files" -> fileLengths.zipWithIndex.map { case (l, i) =>
          Map[String, Any]("length" -> l,
            "path" -> Seq(s"f$i.bin"))
        })
    bencode(Map[String, Any](
      "announce" -> "http://tracker.example.test/announce",
      "created by" -> "graft",
      "info" -> info))
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val torrentSchema: StructType = StructType(Seq(
    StructField("t_name", StringType),
    StructField("piece_length", LongType),
    StructField("n_pieces", IntegerType),
    StructField("n_files", IntegerType),
    StructField("total_length", LongType),
    StructField("infohash", StringType)))

  def decodeTorrent(bytes: Array[Byte]): Seq[Any] =
    torrentMeta(bytes) match {
      case Some(m) => Seq[Any](m.name, m.pieceLength, m.nPieces,
        m.nFiles, m.totalLength, m.infohash)
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-row synth keyed on a SEED column (equal seeds → byte-
    * identical torrents, the planted-duplicate property the
    * infohash-dedup query relies on): single-file for even seeds,
    * multi-file for odd.
    */
  def synthTorrents(df: DataFrame, seedCol: String, outCol: String)
      : DataFrame = {
    val si = df.schema.fieldIndex(seedCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val s = r.get(si) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case x => x.hashCode().toLong
        }
        val nf = java.lang.Math.floorMod(s, 4L).toInt + 1
        val bytes = torrentWrite(s"corpus-$s", 16384L,
          (0 until (if (s % 2 == 0) 1 else nf)).map(j =>
            10000L + java.lang.Math.floorMod(s, 5000L) + j * 77L),
          s)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
