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

  test("a long right-leaning sibling chain walks iteratively " +
      "without recursion (round 16)") {
    // cfbWrite chains top-level entries right-leaning, so N streams
    // give an N-deep sibling chain — the deepest the one-FAT-sector
    // fixture cap allows; the walk itself is worklist-based and
    // would take a 512K-entry chain without growing the JVM stack
    val n = 470
    val streams = (0 until n).map(i =>
      (f"s$i%05d", Array.emptyByteArray))
    val doc = Cfb.cfbStreams(Cfb.cfbWrite(streams)).get
    assert(doc.streams.length == n)
    assert(doc.streams.map(_.name) == streams.map(_._1))
    assert(doc.streams.forall(_.path == ""))
  }

  test("doc text reconstructs through the piece table, both " +
      "encodings") {
    // pure ASCII: both pieces ride the cp1252-compressed path
    val ascii = "plain ascii words, first half then second half."
    assert(Cfb.docText(Cfb.docWrite(ascii))
      .contains(Cfb.DocText(ascii, 2)))
    // unicode tail: the second piece must switch to UTF-16LE
    val mixed = "ascii start half and then Ωμέγα 𝄞 ünïcode"
    val got = Cfb.docText(Cfb.docWrite(mixed)).get
    assert(got.text == mixed, got.text)
    // newlines round-trip through Word's CR paragraph marks
    val paras = "first para\nsecond para\nthird"
    assert(Cfb.docText(Cfb.docWrite(paras)).get.text == paras)
    // empty document
    assert(Cfb.docText(Cfb.docWrite("")).get.text == "")
    // a CFB without WordDocument refuses
    val notDoc = Cfb.cfbWrite(Seq(("Workbook", "x".getBytes)))
    assert(Cfb.docText(notDoc).isEmpty)
    // an encrypted FIB refuses
    val enc = Cfb.docWrite("secret")
    val doc = Cfb.cfbStreams(enc).get
    val word = doc.streams.find(_.name == "WordDocument").get.data
    word(0x0b) = (word(0x0b) | 0x01).toByte // fEncrypted (bit 8)
    val reEnc = Cfb.cfbWrite(doc.streams.map(s =>
      (s.name, if (s.name == "WordDocument") word else s.data)))
    assert(Cfb.docText(reEnc).isEmpty)
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

  test("storage paths: one-level storages round-trip with member " +
      "paths visible (round 15)") {
    val b = graft.operators.Cfb.cfbWrite(Seq(
      ("RootStream", "root data".getBytes),
      ("__attach_version1.0_#00000000/__substg1.0_37010102",
        "attach bytes one".getBytes),
      ("__attach_version1.0_#00000000/__substg1.0_3707001F",
        "n1".getBytes),
      ("__attach_version1.0_#00000001/__substg1.0_37010102",
        ("big " * 2000).getBytes),
      ("TailStream", "tail".getBytes)))
    val doc = graft.operators.Cfb.cfbStreams(b).get
    val byPath = doc.streams.map(s2 =>
      (s2.path, s2.name) -> new String(s2.data.take(16), "UTF-8"))
      .toMap
    assert(byPath(("", "RootStream")) == "root data")
    assert(byPath(("__attach_version1.0_#00000000",
      "__substg1.0_37010102")) == "attach bytes one")
    assert(byPath(("__attach_version1.0_#00000001",
      "__substg1.0_37010102")) == "big big big big ")
    assert(byPath(("", "TailStream")) == "tail")
  }
}
