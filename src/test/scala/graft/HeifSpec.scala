package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Heif, Sniff}

/** HEIF/HEIC/AVIF dims triage: primary-item resolution through
  * pitm+ipma (the decoy-thumbnail trap), channel counts, brand
  * routing in sniff, refusals.
  */
class HeifSpec extends AnyFunSuite {

  test("dims resolve through pitm+ipma to the primary ispe, not " +
      "the first ispe in ipco") {
    val b = Heif.write("heic", "hvc1", 1234, 777, 3, 2)
    val m = Heif.heifMeta(b).get
    // the writer plants a 160x90 decoy at property index 1
    assert(m.width == 1234 && m.height == 777)
    assert(m.brand == "heic" && m.itemType == "hvc1")
    assert(m.nChannels == 3 && m.nItems == 2)
    val a = Heif.heifMeta(Heif.write("avif", "av01", 64, 64, 4, 1))
      .get
    assert(a.brand == "avif" && a.itemType == "av01")
    assert(a.width == 64 && a.nChannels == 4)
  }

  test("sniff routes still-image brands away from video/mp4") {
    assert(Sniff.sniff(Heif.write("heic", "hvc1", 10, 10, 3, 1)) ==
      "image/heic")
    assert(Sniff.sniff(Heif.write("avif", "av01", 10, 10, 3, 1)) ==
      "image/avif")
    assert(Sniff.sniff(Heif.write("mif1", "hvc1", 10, 10, 3, 1)) ==
      "image/heif")
    // a video brand stays video and refuses the HEIF walk
    val vid = Heif.write("isom", "hvc1", 10, 10, 3, 1)
    assert(Sniff.sniff(vid) == "video/mp4")
    assert(Heif.heifMeta(vid).isEmpty)
  }

  test("damage refuses: truncation, missing meta, torn ipma") {
    val b = Heif.write("heic", "hvc1", 100, 50, 3, 1)
    assert(Heif.heifMeta(null).isEmpty)
    assert(Heif.heifMeta(Array.emptyByteArray).isEmpty)
    assert(Heif.heifMeta(b.take(20)).isEmpty)
    assert(Heif.heifMeta(b.take(b.length / 2)).isEmpty)
    assert(Heif.heifMeta("junkjunkjunkjunkjunkjunkjunk"
      .getBytes).isEmpty)
    // flip the primary ispe's property index in ipma so no ispe
    // resolves -> refusal (dims are the point)
    val idx = findIpmaProp2(b)
    assert(idx >= 0)
    val c = b.clone()
    c(idx) = (0x80 | 0x7f).toByte // essential + index 127 (absent)
    assert(Heif.heifMeta(c).isEmpty)
  }

  test("ipma before pitm still resolves the primary item " +
      "(round 16)") {
    val b = Heif.write("heic", "hvc1", 640, 360, 3, 2,
      ipmaFirst = true)
    val m = Heif.heifMeta(b).get
    assert(m.width == 640 && m.height == 360 && m.nChannels == 3)
  }

  test("a crafted 64-bit box size near 2^63 refuses instead of " +
      "wrapping the walk (round 16)") {
    val good = Heif.write("heic", "hvc1", 10, 10, 3, 1)
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(good, 0, 24) // the real ftyp box
    // box with size==1 → 64-bit size 0x7fff_ffff_ffff_ffff
    bomb.write(Array[Byte](0, 0, 0, 1))
    "meta".foreach(c => bomb.write(c.toInt))
    bomb.write(Array[Byte](0x7f, -1, -1, -1, -1, -1, -1, -1))
    bomb.write(new Array[Byte](32))
    assert(Heif.heifMeta(bomb.toByteArray).isEmpty)
    // and the 64-bit header itself truncated
    assert(Heif.heifMeta(bomb.toByteArray.take(34)).isEmpty)
  }

  /** Locate the ipma association byte 0x82 (essential | index 2). */
  private def findIpmaProp2(b: Array[Byte]): Int = {
    // the ipma box: 'ipma' fourcc, version/flags, count, then
    // item 1's first association byte at +14 from the fourcc
    var i = 0
    while (i + 4 < b.length) {
      if (b(i) == 'i' && b(i + 1) == 'p' && b(i + 2) == 'm' &&
        b(i + 3) == 'a') return i + 4 + 4 + 4 + 2 + 1
      i += 1
    }
    -1
  }
}
