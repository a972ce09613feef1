package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Packet-capture triage (C246) — security and ops drops land
  * .pcap/.pcapng next to the logs a lake already censuses. Both
  * layouts are public (the libpcap file format and the IETF
  * pcapng draft):
  *
  *  - classic pcap: a 24-byte global header whose magic encodes
  *    BOTH endianness and timestamp resolution (A1B2C3D4 usec /
  *    A1B23C4D nsec, byte-swapped when little-endian), version,
  *    snaplen, linktype; then per-packet records (ts, caplen,
  *    origlen) whose caplen must fit the file and snaplen.
  *  - pcapng: typed blocks (SHB 0x0A0D0D0A with its own byte-order
  *    magic, IDB 1, EPB 6, SPB 3), each length-framed front AND
  *    back — the walk verifies both lengths agree.
  *
  * Surfaced: container, endianness, ts resolution, linktype name
  * (the common LINKTYPE_* table), packet count, captured/original
  * byte totals, truncated-packet count, and for pcapng the
  * section/interface counts. No tcpdump/wireshark ships here
  * (probe recorded), so fixtures are spec-built; the writer
  * round-trips.
  *
  * Totality: None on damage. Scale: per-value map-only.
  */
object Pcap {

  private val MaxPackets = 1 << 20

  val LinkNames: Map[Int, String] = Map(
    0 -> "null", 1 -> "ethernet", 101 -> "raw", 105 -> "ieee80211",
    113 -> "linux_sll", 127 -> "ieee80211_radiotap",
    228 -> "ipv4", 229 -> "ipv6")

  final case class PcapMeta(container: String, littleEndian: Boolean,
      nanos: Boolean, linktype: String, nPackets: Long,
      capBytes: Long, origBytes: Long, nTruncated: Long,
      nSections: Int, nInterfaces: Int)

  private final case class PFail() extends RuntimeException

  private def u32(b: Array[Byte], o: Int, le: Boolean): Long = {
    if (o < 0 || o + 4 > b.length) throw PFail()
    if (le)
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    else
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int = {
    if (o < 0 || o + 2 > b.length) throw PFail()
    if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }

  /** Classic pcap starting after magic detection. */
  private def classic(b: Array[Byte], le: Boolean, nanos: Boolean)
      : PcapMeta = {
    if (b.length < 24) throw PFail()
    val major = u16(b, 4, le)
    if (major != 2) throw PFail()
    val snaplen = u32(b, 16, le)
    val linktype = u32(b, 20, le).toInt
    var p = 24
    var n = 0L
    var cap = 0L
    var orig = 0L
    var trunc = 0L
    while (p < b.length) {
      if (b.length - p < 16) throw PFail()
      val caplen = u32(b, p + 8, le)
      val origlen = u32(b, p + 12, le)
      if (caplen > snaplen || caplen > b.length - p - 16)
        throw PFail()
      n += 1
      if (n > MaxPackets) throw PFail()
      cap += caplen
      orig += origlen
      if (caplen < origlen) trunc += 1
      p += 16 + caplen.toInt
    }
    PcapMeta("pcap", le, nanos,
      LinkNames.getOrElse(linktype, s"link$linktype"), n, cap,
      orig, trunc, 1, 1)
  }

  /** pcapng block walk. */
  private def ng(b: Array[Byte]): PcapMeta = {
    var p = 0
    var le = true
    var nSections = 0
    var nInterfaces = 0
    var linktype = -1
    var snaplen = -1L
    var n = 0L
    var cap = 0L
    var orig = 0L
    var trunc = 0L
    var blocks = 0L
    while (p < b.length) {
      if (b.length - p < 12) throw PFail()
      blocks += 1
      if (blocks > MaxPackets) throw PFail()
      // SHB carries its own byte-order magic; detect per section
      val btRaw = u32(b, p, le = true)
      val isShb = btRaw == 0x0A0D0D0AL // palindromic either way
      if (isShb) {
        // the BOM reads 0x1A2B3C4D in the section's OWN order
        val bomLe = u32(b, p + 8, le = true)
        if (bomLe == 0x1A2B3C4DL) le = true
        else if (u32(b, p + 8, le = false) == 0x1A2B3C4DL)
          le = false
        else throw PFail()
        nSections += 1
        // snaplen is per-section state: an SPB's captured length
        // uses ITS section's IDB, not an earlier section's
        snaplen = -1L
      }
      val bt = u32(b, p, le)
      val totalLen = u32(b, p + 4, le)
      if (totalLen < 12 || totalLen % 4 != 0 ||
        totalLen > b.length - p) throw PFail()
      // trailing length must agree
      if (u32(b, p + totalLen.toInt - 4, le) != totalLen)
        throw PFail()
      if (!isShb) bt match {
        case 1L => // IDB: linktype u16 + reserved + snaplen u32
          nInterfaces += 1
          if (linktype < 0) linktype = u16(b, p + 8, le)
          if (snaplen < 0) snaplen = u32(b, p + 12, le)
        case 6L => // EPB: iface, ts hi/lo, caplen, origlen
          val caplen = u32(b, p + 20, le)
          val origlen = u32(b, p + 24, le)
          if (caplen > totalLen - 32) throw PFail()
          n += 1
          cap += caplen
          orig += origlen
          if (caplen < origlen) trunc += 1
        case 3L => // SPB: origlen only. The payload length is NOT
          // recoverable from totalLen alone (the block pads to a
          // 4-byte boundary, so totalLen - 16 overcounts by up to 3);
          // per the pcapng spec the captured length is
          // min(origlen, section IDB snaplen), snaplen 0 = unlimited.
          val origlen = u32(b, p + 8, le)
          n += 1
          val room = totalLen - 16 // payload + pad upper bound
          val c =
            if (snaplen > 0) math.min(math.min(snaplen, origlen), room)
            else math.min(origlen, room)
          cap += c
          orig += origlen
          if (c < origlen) trunc += 1
        case _ => () // options/NRB/ISB: counted as blocks only
      }
      p += totalLen.toInt
    }
    if (nSections == 0) throw PFail()
    PcapMeta("pcapng", le, nanos = false,
      if (linktype < 0) "none"
      else LinkNames.getOrElse(linktype, s"link$linktype"),
      n, cap, orig, trunc, nSections, nInterfaces)
  }

  /** Parse one capture. None on damage. */
  def pcapMeta(b: Array[Byte]): Option[PcapMeta] = {
    if (b == null || b.length < 12) return None
    try {
      val be = u32(b, 0, le = false)
      val result = be match {
        case 0xA1B2C3D4L => classic(b, le = false, nanos = false)
        case 0xD4C3B2A1L => classic(b, le = true, nanos = false)
        case 0xA1B23C4DL => classic(b, le = false, nanos = true)
        case 0x4D3CB2A1L => classic(b, le = true, nanos = true)
        case 0x0A0D0D0AL => ng(b)
        case _ => return None
      }
      Some(result)
    } catch {
      case _: PFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (fixture/synth)
  // ---------------------------------------------------------------

  private def le32(out: java.io.ByteArrayOutputStream, v: Long)
      : Unit = {
    var i = 0
    while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** A little-endian usec classic pcap with planted packets
    * (caplen, origlen) pairs.
    */
  def pcapWrite(linktype: Int, packets: Seq[(Int, Int)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    le32(out, 0xA1B2C3D4L) // written LE → file reads D4C3B2A1 BE
    out.write(2); out.write(0); out.write(4); out.write(0)
    le32(out, 0L); le32(out, 0L)
    le32(out, 65535L)
    le32(out, linktype.toLong)
    packets.zipWithIndex.foreach { case ((caplen, origlen), i) =>
      le32(out, 1700000000L + i); le32(out, 0L)
      le32(out, caplen.toLong); le32(out, origlen.toLong)
      (0 until caplen).foreach(j => out.write((i + j) & 0xff))
    }
    out.toByteArray
  }

  /** A little-endian pcapng: SHB + IDB + EPBs. */
  def pcapngWrite(linktype: Int, packets: Seq[(Int, Int)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def block(bt: Long, body: Array[Byte]): Unit = {
      val pad = (4 - body.length % 4) % 4
      val total = 12 + body.length + pad
      le32(out, bt); le32(out, total.toLong)
      out.write(body)
      (0 until pad).foreach(_ => out.write(0))
      le32(out, total.toLong)
    }
    val shb = new java.io.ByteArrayOutputStream()
    le32(shb, 0x1A2B3C4DL)
    shb.write(1); shb.write(0); shb.write(0); shb.write(0)
    le32(shb, 0xffffffffL); le32(shb, 0xffffffffL) // section len -1
    block(0x0A0D0D0AL, shb.toByteArray)
    val idb = new java.io.ByteArrayOutputStream()
    idb.write(linktype & 0xff); idb.write((linktype >> 8) & 0xff)
    idb.write(0); idb.write(0)
    le32(idb, 65535L)
    block(1L, idb.toByteArray)
    packets.zipWithIndex.foreach { case ((caplen, origlen), i) =>
      val epb = new java.io.ByteArrayOutputStream()
      le32(epb, 0L) // interface
      le32(epb, 0L); le32(epb, (1700000000L + i))
      le32(epb, caplen.toLong); le32(epb, origlen.toLong)
      (0 until caplen).foreach(j => epb.write((i * 3 + j) & 0xff))
      block(6L, epb.toByteArray)
    }
    out.toByteArray
  }

  /** A little-endian pcapng using Simple Packet Blocks: SHB + one
    * IDB carrying `snaplen` + SPBs. Per the spec an SPB records only
    * the ORIGINAL length; the writer stores min(origlen, snaplen)
    * payload bytes (snaplen 0 = unlimited), then pads to 4 — so the
    * on-wire block length alone overstates the captured length by up
    * to 3 bytes, which is exactly what the reader must not do.
    */
  def pcapngWriteSpb(linktype: Int, snaplen: Int,
      origlens: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def block(bt: Long, body: Array[Byte]): Unit = {
      val pad = (4 - body.length % 4) % 4
      val total = 12 + body.length + pad
      le32(out, bt); le32(out, total.toLong)
      out.write(body)
      (0 until pad).foreach(_ => out.write(0))
      le32(out, total.toLong)
    }
    val shb = new java.io.ByteArrayOutputStream()
    le32(shb, 0x1A2B3C4DL)
    shb.write(1); shb.write(0); shb.write(0); shb.write(0)
    le32(shb, 0xffffffffL); le32(shb, 0xffffffffL)
    block(0x0A0D0D0AL, shb.toByteArray)
    val idb = new java.io.ByteArrayOutputStream()
    idb.write(linktype & 0xff); idb.write((linktype >> 8) & 0xff)
    idb.write(0); idb.write(0)
    le32(idb, snaplen.toLong)
    block(1L, idb.toByteArray)
    origlens.zipWithIndex.foreach { case (origlen, i) =>
      val spb = new java.io.ByteArrayOutputStream()
      le32(spb, origlen.toLong)
      val stored =
        if (snaplen > 0) math.min(origlen, snaplen) else origlen
      (0 until stored).foreach(j => spb.write((i * 7 + j) & 0xff))
      block(3L, spb.toByteArray)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val pcapSchema: StructType = StructType(Seq(
    StructField("container", StringType),
    StructField("little_endian", BooleanType),
    StructField("nanos", BooleanType),
    StructField("linktype", StringType),
    StructField("n_packets", LongType),
    StructField("cap_bytes", LongType),
    StructField("orig_bytes", LongType),
    StructField("n_truncated", LongType),
    StructField("n_interfaces", IntegerType)))

  def decodePcap(bytes: Array[Byte]): Seq[Any] =
    pcapMeta(bytes) match {
      case Some(m) => Seq[Any](m.container, m.littleEndian,
        m.nanos, m.linktype, m.nPackets, m.capBytes, m.origBytes,
        m.nTruncated, m.nInterfaces)
      case None => Seq[Any](null, null, null, null, null, null,
        null, null, null)
    }

  /** Per-doc synth: classic/ng cycling by parity, one truncated
    * packet planted per doc.
    */
  def synthPcaps(df: DataFrame, idCol: String, outCol: String)
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
        val n = (id % 5 + 1).toInt
        // n full packets of growing size + one truncated
        val packets = (0 until n).map { j =>
          val size = 40 + 10 * j + (id % 20).toInt
          (size, size)
        } :+ ((60, 120))
        val linktype = if (id % 3 == 0) 113 else 1
        val bytes =
          if (id % 2 == 0) pcapWrite(linktype, packets)
          else pcapngWrite(linktype, packets)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
