package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pcap

/** Capture triage: classic pcap round-trips with exact byte
  * totals and truncation counts; pcapng walks blocks with both
  * length frames verified; magic variants map to the right
  * endianness/resolution; damage refuses; total.
  */
class PcapSpec extends AnyFunSuite {

  test("classic pcap round-trips planted packets") {
    val b = Pcap.pcapWrite(1, Seq((100, 100), (60, 200), (40, 40)))
    val m = Pcap.pcapMeta(b).get
    assert(m.container == "pcap" && m.littleEndian && !m.nanos)
    assert(m.linktype == "ethernet")
    assert(m.nPackets == 3 && m.capBytes == 200 &&
      m.origBytes == 340 && m.nTruncated == 1)
  }

  test("pcapng walks SHB/IDB/EPB with double length framing") {
    val b = Pcap.pcapngWrite(113, Seq((80, 80), (50, 90)))
    val m = Pcap.pcapMeta(b).get
    assert(m.container == "pcapng" && m.littleEndian)
    assert(m.linktype == "linux_sll" && m.nSections == 1 &&
      m.nInterfaces == 1)
    assert(m.nPackets == 2 && m.capBytes == 130 &&
      m.origBytes == 170 && m.nTruncated == 1)
  }

  test("pcapng SPBs: captured = min(origlen, snaplen), never the " +
      "padded block length") {
    // origlen 61 with snaplen 0 (unlimited): payload 61 pads to 64
    // on the wire; a totalLen-16 reader would overcount cap_bytes by
    // 3 and call the packet truncated (r16 ADVICE finding).
    val unlimited = Pcap.pcapMeta(
      Pcap.pcapngWriteSpb(1, 0, Seq(61, 40))).get
    assert(unlimited.nPackets == 2 && unlimited.capBytes == 101 &&
      unlimited.origBytes == 101 && unlimited.nTruncated == 0)
    // snaplen 48 truncates the 61- and 100-byte packets, not the 30
    val snapped = Pcap.pcapMeta(
      Pcap.pcapngWriteSpb(1, 48, Seq(61, 30, 100))).get
    assert(snapped.nPackets == 3 &&
      snapped.capBytes == 48 + 30 + 48 &&
      snapped.origBytes == 191 && snapped.nTruncated == 2)
  }

  test("snaplen is per-section state: a second section's SPBs use " +
      "ITS IDB, not the first section's") {
    // section 1: snaplen 48; section 2: unlimited. Concatenating
    // two single-section files IS a valid multi-section capture.
    val twoSections = Pcap.pcapngWriteSpb(1, 48, Seq(100)) ++
      Pcap.pcapngWriteSpb(1, 0, Seq(61))
    val m = Pcap.pcapMeta(twoSections).get
    assert(m.nSections == 2 && m.nInterfaces == 2)
    // section 1 truncates 100→48; section 2's 61 is NOT clamped to
    // 48 (and not padded-overcounted to 64 either)
    assert(m.nPackets == 2 && m.capBytes == 48 + 61 &&
      m.origBytes == 161 && m.nTruncated == 1)
  }

  test("magic variants map to endianness and resolution") {
    val base = Pcap.pcapWrite(1, Seq((30, 30)))
    // rewrite the magic to the nanosecond little-endian variant
    val ns = base.clone()
    ns(0) = 0x4d; ns(1) = 0x3c.toByte
    ns(2) = 0xb2.toByte; ns(3) = 0xa1.toByte
    val m = Pcap.pcapMeta(ns).get
    assert(m.nanos && m.littleEndian)
    assert(Pcap.pcapMeta("notacapture".getBytes).isEmpty)
  }

  test("damage refuses: caplen lies, torn records, bad trailing " +
      "length") {
    val good = Pcap.pcapWrite(1, Seq((50, 50)))
    assert(Pcap.pcapMeta(null).isEmpty)
    assert(Pcap.pcapMeta(good.dropRight(3)).isEmpty)
    val lying = good.clone()
    lying(32) = 0x7f // caplen low byte → past the file
    assert(Pcap.pcapMeta(lying).isEmpty)
    val ngGood = Pcap.pcapngWrite(1, Seq((40, 40)))
    val badTail = ngGood.clone()
    badTail(badTail.length - 1) = 0x7f
    assert(Pcap.pcapMeta(badTail).isEmpty)
  }

  test("the walk is total over mutated bytes") {
    val bases = Seq(
      Pcap.pcapWrite(1, Seq((60, 60), (30, 80))),
      Pcap.pcapngWrite(1, Seq((60, 60), (30, 80))))
    val rnd = new scala.util.Random(246)
    bases.foreach { base =>
      (0 until 150).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        Pcap.pcapMeta(m) // must not throw
      }
      (0 until 30).foreach { _ =>
        Pcap.pcapMeta(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
