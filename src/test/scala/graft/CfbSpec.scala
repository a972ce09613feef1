package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cfb

/** MS-CFB container walk: both stream paths (FAT and miniFAT) must
  * round-trip planted bytes; classification by stream names;
  * structural damage refuses.
  */
class CfbSpec extends AnyFunSuite {

  test("small streams ride the mini stream and round-trip") {
    val streams = Seq(
      ("WordDocument", "legacy doc text é→Ω".getBytes("UTF-8")),
      ("SummaryInformation", "meta".getBytes("UTF-8")),
      ("Empty", Array.emptyByteArray))
    val b = Cfb.cfbWrite(streams)
    val doc = Cfb.cfbStreams(b).get
    assert(doc.label == "application/msword")
    assert(doc.streams.map(_.name) == streams.map(_._1))
    for ((s, (_, data)) <- doc.streams.zip(streams))
      assert(s.data.sameElements(data), s.name)
  }

  test("big streams (>=4096) ride FAT chains and round-trip") {
    val big = Array.tabulate[Byte](9000)(i => (i * 13 + 7).toByte)
    val streams = Seq(
      ("Workbook", big),
      ("small", "tiny".getBytes("UTF-8")))
    val b = Cfb.cfbWrite(streams)
    val doc = Cfb.cfbStreams(b).get
    assert(doc.label == "application/vnd.ms-excel")
    assert(doc.streams.head.data.sameElements(big))
    assert(doc.streams(1).data.sameElements("tiny".getBytes))
  }

  test("classification labels: ppt, encrypted, generic") {
    def labelOf(names: Seq[String]): String =
      Cfb.cfbStreams(Cfb.cfbWrite(
        names.map(n => (n, "x".getBytes)))).get.label
    assert(labelOf(Seq("PowerPoint Document")) ==
      "application/vnd.ms-powerpoint")
    assert(labelOf(Seq("EncryptedPackage")) ==
      "application/x-cfb-encrypted")
    assert(labelOf(Seq("just a stream")) == "application/x-cfb")
  }

  test("structural damage refuses") {
    assert(Cfb.cfbStreams(null).isEmpty)
    assert(Cfb.cfbStreams(new Array[Byte](100)).isEmpty)
    val good = Cfb.cfbWrite(Seq(("s", "data".getBytes)))
    assert(Cfb.cfbStreams(good).isDefined)
    assert(Cfb.cfbStreams(good.take(512)).isEmpty, "header only")
    // cyclic FAT chain: point the dir chain at itself
    val bad = good.clone()
    // dir start sector from header
    val dirSect = (bad(48) & 0xff) | ((bad(49) & 0xff) << 8)
    val fatOff = 512 + dirSect * 4
    bad(fatOff) = dirSect.toByte
    bad(fatOff + 1) = 0; bad(fatOff + 2) = 0; bad(fatOff + 3) = 0
    assert(Cfb.cfbStreams(bad).isEmpty, "cycle must refuse")
  }

  test("cfb walk is total under mutation") {
    val rnd = new scala.util.Random(0xCFBL)
    val valid = Cfb.cfbWrite(Seq(
      ("WordDocument", ("w " * 600).getBytes), // > 4096: FAT path
      ("small", "s".getBytes)))
    for (_ <- 0 until 150) {
      val m = valid.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Cfb.cfbStreams(m) // must never throw
    }
    for (cut <- Seq(8, 300, 512, 1024, valid.length - 3))
      Cfb.cfbStreams(valid.take(cut))
  }
}
