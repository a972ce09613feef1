package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Delta Lake DELETION VECTORS (round 18) — how Delta does
  * row-level deletes at 100 TB without rewriting data files: an
  * add-file's `deletionVector` descriptor points at a DV blob
  * whose payload is a 64-bit RoaringBitmapArray in the "portable"
  * serialization (the Delta protocol spec + the public
  * RoaringFormatSpec):
  *
  *  - blob: 1 version byte (= 1), then per stored DV a big-endian
  *    i32 data size, the bitmap bytes, and a big-endian CRC32 of
  *    those bytes (a lying checksum refuses the blob);
  *  - RoaringBitmapArray: magic 1681511377 (LE), an i64 bitmap
  *    count, then per bitmap an i32 high key and a STANDARD 32-bit
  *    roaring bitmap in portable form;
  *  - 32-bit roaring: cookie 12346 (+ i32 size) for no-run maps or
  *    12347 | (n-1)<<16 with a run-flag bitset; (key, card-1)
  *    descriptor pairs; an offset table only when n >= 4 and no
  *    runs; then the containers in key order — ARRAY (sorted LE
  *    u16s), BITMAP (8 KiB of LE longs), RUN (u16 run count, then
  *    (start, length-1) u16 pairs).
  *
  * The parser and writer below implement the public spec by hand;
  * DeletionVectorSpec pins BOTH directions against the classpath
  * org.roaringbitmap reference implementation (our bytes
  * deserialize to the same set; its serialize() parses to the
  * same set), the same reference-writer method the ORC bloom and
  * parquet bloom tiers use. Totality: refusal (None) on any
  * structural lie, never an exception.
  */
object DeletionVectors {

  private object DvFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  val PortableMagic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val NoOffsetThreshold = 4
  private val MaxContainers = 1 << 16

  /** One 16-bit-keyed container of a 32-bit roaring bitmap. */
  sealed trait Container {
    def key: Int
    def cardinality: Int
    def contains(low16: Int): Boolean
    def min: Int
    def max: Int
  }
  final case class ArrayC(key: Int, values: Array[Char])
      extends Container {
    def cardinality: Int = values.length
    def contains(low16: Int): Boolean =
      java.util.Arrays.binarySearch(values, low16.toChar) >= 0
    def min: Int = values.head.toInt
    def max: Int = values.last.toInt
  }
  final case class BitmapC(key: Int, bits: Array[Long],
      cardinality: Int) extends Container {
    def contains(low16: Int): Boolean =
      (bits(low16 >>> 6) & (1L << (low16 & 63))) != 0
    def min: Int = {
      var i = 0
      while (bits(i) == 0) i += 1
      i * 64 + java.lang.Long.numberOfTrailingZeros(bits(i))
    }
    def max: Int = {
      var i = bits.length - 1
      while (bits(i) == 0) i -= 1
      i * 64 + 63 - java.lang.Long.numberOfLeadingZeros(bits(i))
    }
  }
  final case class RunC(key: Int, runs: Array[(Int, Int)])
      extends Container { // (start, end) inclusive
    def cardinality: Int = runs.map(r => r._2 - r._1 + 1).sum
    def contains(low16: Int): Boolean =
      runs.exists(r => low16 >= r._1 && low16 <= r._2)
    def min: Int = runs.head._1
    def max: Int = runs.last._2
  }

  /** A 32-bit roaring bitmap: containers sorted by key. */
  final case class Rb32(containers: Vector[Container]) {
    def contains(v: Int): Boolean = {
      val key = (v >>> 16) & 0xffff
      containers.find(_.key == key).exists(_.contains(v & 0xffff))
    }
    def cardinality: Long = containers.map(_.cardinality.toLong).sum
  }

  /** The 64-bit array: (highKey → 32-bit map), sorted. */
  final case class Rb64(maps: Vector[(Int, Rb32)]) {
    def contains(v: Long): Boolean = {
      val hi = (v >>> 32).toInt
      maps.find(_._1 == hi).exists(_._2.contains(v.toInt))
    }
    def cardinality: Long = maps.map(_._2.cardinality).sum
  }

  // ---------------------------------------------------------------
  // parsing
  // ---------------------------------------------------------------

  private final class R(val b: Array[Byte], var p: Int,
      val end: Int) {
    def u8(): Int = {
      if (p >= end) throw DvFail
      val v = b(p) & 0xff; p += 1; v
    }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u16le() | (u16le() << 16)
    def i64le(): Long =
      (i32le() & 0xffffffffL) | ((i32le() & 0xffffffffL) << 32)
    def i32be(): Int = {
      val a = u8(); val b2 = u8(); val c = u8(); val d = u8()
      (a << 24) | (b2 << 16) | (c << 8) | d
    }
    def take(n: Int): (Int, Int) = {
      if (n < 0 || n > end - p) throw DvFail
      val r = (p, p + n); p += n; r
    }
  }

  /** Parse one 32-bit roaring bitmap (portable). */
  private def parseRb32(r: R): Rb32 = {
    val cookie = r.i32le()
    val (n, runFlags) =
      if ((cookie & 0xffff) == CookieRun) {
        val n = (cookie >>> 16) + 1
        if (n <= 0 || n > MaxContainers) throw DvFail
        val flags = new Array[Byte]((n + 7) / 8)
        var i = 0
        while (i < flags.length) { flags(i) = r.u8().toByte; i += 1 }
        (n, flags)
      } else if (cookie == CookieNoRun) {
        val n = r.i32le()
        if (n < 0 || n > MaxContainers) throw DvFail
        (n, null)
      } else throw DvFail
    def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i >>> 3) & (1 << (i & 7))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = r.u16le()
      cards(i) = r.u16le() + 1
      if (i > 0 && keys(i) <= keys(i - 1)) throw DvFail
      i += 1
    }
    // the offset table exists without runs, or with runs when
    // n >= NoOffsetThreshold; containers are laid out in key order
    // directly after, so the offsets are redundant for a
    // sequential parse — validated for range, then walked past
    if (runFlags == null || n >= NoOffsetThreshold) {
      var j = 0
      while (j < n) {
        val off = r.i32le()
        if (off < 0) throw DvFail
        j += 1
      }
    }
    val out = Vector.newBuilder[Container]
    i = 0
    while (i < n) {
      if (isRun(i)) {
        val nRuns = r.u16le()
        val runs = new Array[(Int, Int)](nRuns)
        var j = 0
        var prevEnd = -1
        var card = 0
        while (j < nRuns) {
          val start = r.u16le()
          val len = r.u16le()
          if (start <= prevEnd) throw DvFail
          prevEnd = start + len
          if (prevEnd > 0xffff) throw DvFail
          runs(j) = (start, start + len)
          card += len + 1
          j += 1
        }
        if (card != cards(i)) throw DvFail
        out += RunC(keys(i), runs)
      } else if (cards(i) > 4096) {
        val (f, _) = r.take(8192)
        val bits = new Array[Long](1024)
        var j = 0
        while (j < 1024) {
          var v = 0L
          var k = 0
          while (k < 8) {
            v |= (r.b(f + j * 8 + k) & 0xffL) << (8 * k); k += 1
          }
          bits(j) = v
          j += 1
        }
        if (bits.map(java.lang.Long.bitCount(_).toLong).sum
            != cards(i)) throw DvFail
        out += BitmapC(keys(i), bits, cards(i))
      } else {
        val vals = new Array[Char](cards(i))
        var j = 0
        while (j < cards(i)) {
          vals(j) = r.u16le().toChar
          if (j > 0 && vals(j) <= vals(j - 1)) throw DvFail
          j += 1
        }
        out += ArrayC(keys(i), vals)
      }
      i += 1
    }
    Rb32(out.result())
  }

  /** Parse a 64-bit RoaringBitmapArray (portable). */
  def parseRb64(b: Array[Byte]): Option[Rb64] = {
    if (b == null || b.length < 12) return None
    try {
      val r = new R(b, 0, b.length)
      if (r.i32le() != PortableMagic) return None
      val n = r.i64le()
      if (n < 0 || n > 4096) return None
      val maps = Vector.newBuilder[(Int, Rb32)]
      var prev = -1L
      var i = 0L
      while (i < n) {
        val hi = r.i32le()
        if ((hi & 0xffffffffL) <= prev && i > 0) throw DvFail
        prev = hi & 0xffffffffL
        maps += ((hi, parseRb32(r)))
        i += 1
      }
      if (r.p != r.end) return None // trailing bytes lie
      Some(Rb64(maps.result()))
    } catch {
      case DvFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Parse a stored DV blob: version 1, then [size BE][bitmap
    * bytes][crc32 BE]; the checksum must verify.
    */
  def parseDvBlob(b: Array[Byte]): Option[Rb64] = {
    if (b == null || b.length < 9) return None
    if ((b(0) & 0xff) != 1) return None
    try {
      val r = new R(b, 1, b.length)
      val size = r.i32be()
      if (size <= 0 || size > b.length - 9) return None
      val (f, u) = r.take(size)
      val crc = r.i32be()
      if (r.p != r.end) return None
      val c = new java.util.zip.CRC32()
      c.update(b, f, size)
      if (c.getValue.toInt != crc) return None
      parseRb64(java.util.Arrays.copyOfRange(b, f, u))
    } catch {
      case DvFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writers (fixture synth; the spec pins them against the
  // classpath org.roaringbitmap reference implementation)
  // ---------------------------------------------------------------

  private def wLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def wLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    wLe16(o, v & 0xffff); wLe16(o, v >>> 16)
  }
  private def wBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }

  /** Serialize one 32-bit map from containers (already sorted). */
  def writeRb32(cs: Seq[Container]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val hasRun = cs.exists(_.isInstanceOf[RunC])
    val n = cs.length
    if (hasRun) {
      wLe32(o, CookieRun | ((n - 1) << 16))
      val flags = new Array[Byte]((n + 7) / 8)
      cs.zipWithIndex.foreach { case (c, i) =>
        if (c.isInstanceOf[RunC])
          flags(i >>> 3) = (flags(i >>> 3) | (1 << (i & 7))).toByte
      }
      o.write(flags, 0, flags.length)
    } else {
      wLe32(o, CookieNoRun)
      wLe32(o, n)
    }
    cs.foreach { c =>
      wLe16(o, c.key); wLe16(o, c.cardinality - 1)
    }
    if (!hasRun || n >= NoOffsetThreshold) {
      // offsets from the start of the serialized map
      val headerLen = if (hasRun) 4 + (n + 7) / 8 + 4 * n + 4 * n
        else 8 + 4 * n + 4 * n
      var off = headerLen
      cs.foreach { c =>
        wLe32(o, off)
        off += (c match {
          case a: ArrayC => 2 * a.values.length
          case _: BitmapC => 8192
          case rc: RunC => 2 + 4 * rc.runs.length
        })
      }
    }
    cs.foreach {
      case a: ArrayC => a.values.foreach(v => wLe16(o, v.toInt))
      case bm: BitmapC => bm.bits.foreach { l =>
        var k = 0
        while (k < 8) { o.write(((l >>> (8 * k)) & 0xff).toInt); k += 1 }
      }
      case rc: RunC =>
        wLe16(o, rc.runs.length)
        rc.runs.foreach { case (s, e) =>
          wLe16(o, s); wLe16(o, e - s)
        }
    }
    o.toByteArray
  }

  /** Serialize an Rb64 in the portable RoaringBitmapArray form. */
  def writeRb64(maps: Seq[(Int, Seq[Container])]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    wLe32(o, PortableMagic)
    wLe32(o, maps.length); wLe32(o, 0) // i64 LE count
    maps.foreach { case (hi, cs) =>
      wLe32(o, hi)
      val b = writeRb32(cs)
      o.write(b, 0, b.length)
    }
    o.toByteArray
  }

  /** Wrap bitmap bytes in the stored-blob frame (version, BE size,
    * CRC32).
    */
  def writeDvBlob(bitmap: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(1)
    wBe32(o, bitmap.length)
    o.write(bitmap, 0, bitmap.length)
    val c = new java.util.zip.CRC32()
    c.update(bitmap, 0, bitmap.length)
    wBe32(o, c.getValue.toInt)
    o.toByteArray
  }

  // ---------------------------------------------------------------
  // planted fixture + census kernel
  // ---------------------------------------------------------------

  /** The planted DV for table `id` — one high key (id%3), three
    * u16-key container regions exercising all three kinds:
    *  - key 0 ARRAY: p in 0..99 with p % 7 == id % 7;
    *  - key 1 RUN: [a, a+49] and [a+100, a+149], a = id % 1000;
    *  - key 2 BITMAP (even ids only): every even low16 value.
    */
  def dvWrite(id: Long): Array[Byte] = {
    val arr = (0 until 100).filter(_ % 7 == (id % 7).toInt)
      .map(_.toChar).toArray
    val a = (id % 1000).toInt
    val runs = Array((a, a + 49), (a + 100, a + 149))
    val cs = Seq.newBuilder[Container]
    cs += ArrayC(0, arr)
    cs += RunC(1, runs)
    if (id % 2 == 0) {
      val bits = Array.fill(1024)(0x5555555555555555L)
      cs += BitmapC(2, bits, 32768)
    }
    writeDvBlob(writeRb64(Seq(((id % 3).toInt, cs.result()))))
  }

  val dvSchema: StructType = StructType(Seq(
    StructField("n_high_keys", IntegerType),
    StructField("cardinality", LongType),
    StructField("n_array", IntegerType),
    StructField("n_bitmap", IntegerType),
    StructField("n_run", IntegerType),
    StructField("dv_min", LongType),
    StructField("dv_max", LongType),
    StructField("member_hit", BooleanType),
    StructField("absent_hit", BooleanType),
    StructField("live_0_40", IntegerType)))

  private def nullRow10 = Seq[Any](null, null, null, null, null,
    null, null, null, null, null)

  /** Census one DV blob + LIVE probes: `memberProbe` must be a
    * deleted row, `absentProbe` a kept one, and live_0_40 counts
    * surviving rows in the first 40 positions of the table's base
    * region — the MOR filter decision itself.
    */
  def decodeDv(bytes: Array[Byte], memberProbe: Long,
      absentProbe: Long, base: Long): Seq[Any] =
    parseDvBlob(bytes) match {
      case Some(rb) =>
        val cs = rb.maps.flatMap(_._2.containers)
        // an EMPTY 32-bit map is legal roaring (the empty set) but
        // has no min/max — census it as a refusal rather than
        // letting containers.head throw in the executor
        if (cs.isEmpty || rb.maps.exists(_._2.containers.isEmpty))
          return nullRow10
        val mins = rb.maps.map { case (hi, m) =>
          (hi.toLong << 32) |
            ((m.containers.head.key.toLong << 16) |
              m.containers.head.min) }
        val maxs = rb.maps.map { case (hi, m) =>
          (hi.toLong << 32) |
            ((m.containers.last.key.toLong << 16) |
              m.containers.last.max) }
        var live = 0
        var p = 0L
        while (p < 40) {
          if (!rb.contains(base + p)) live += 1
          p += 1
        }
        Seq[Any](rb.maps.length, rb.cardinality,
          cs.count(_.isInstanceOf[ArrayC]),
          cs.count(_.isInstanceOf[BitmapC]),
          cs.count(_.isInstanceOf[RunC]),
          mins.min, maxs.max,
          rb.contains(memberProbe), rb.contains(absentProbe), live)
      case None => nullRow10
    }

  /** Spark plumbing: one census row per doc, planted probes
    * derived from the doc id (parse per row is the honest cost —
    * every doc's DV differs).
    */
  def dvRows(df: DataFrame, idCol: String): DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields(ii) +: dvSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val base = (id % 3) << 32
        val a = id % 1000
        // in run 1 of container 1 / key-3 region never populated
        val member = base | (1L << 16) | (a + 10)
        val absent = base | (3L << 16) | 5L
        Row.fromSeq(r.get(ii) +: decodeDv(dvWrite(id), member,
          absent, base))
      }
    }(enc)
  }
}
