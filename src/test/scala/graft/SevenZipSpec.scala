package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SevenZip

/** 7z container walk: reference fixtures written by libarchive's
  * bsdtar (one per supported coder — store/lzma1/lzma2/bzip2/
  * deflate, all with LZMA-compressed `kEncodedHeader`s) plus the
  * libarchive project's own test archive (multi-substream LZMA2
  * folder + a directory entry), the in-repo writer round-trip, and
  * damage refusals.
  */
class SevenZipSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/sevenzip/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  private val aTxt = resource("a.txt")
  private val repTxt = resource("rep.txt")
  private val randBin = resource("rand.bin")

  test("bsdtar reference fixtures: every coder lists and extracts " +
      "byte-exactly through the encoded-header path") {
    val cases = Seq(
      ("sz_store.7z", "store",
        Seq("a.txt" -> aTxt, "rep.txt" -> repTxt)),
      ("sz_lzma1.7z", "lzma",
        Seq("a.txt" -> aTxt, "rep.txt" -> repTxt,
          "rand.bin" -> randBin)),
      ("sz_lzma2.7z", "lzma2",
        Seq("a.txt" -> aTxt, "rep.txt" -> repTxt,
          "rand.bin" -> randBin)),
      ("sz_bzip2.7z", "bzip2",
        Seq("rep.txt" -> repTxt, "a.txt" -> aTxt)),
      ("sz_deflate.7z", "deflate",
        Seq("a.txt" -> aTxt, "rep.txt" -> repTxt)))
    for ((fixture, method, members) <- cases) {
      val b = resource(fixture)
      val es = SevenZip.entries(b)
      assert(es.isDefined, fixture)
      val got = SevenZip.extractAll(b).get
        .map { case (e, d) => e.name -> (e, d) }.toMap
      for ((name, want) <- members) {
        val (e, d) = got.getOrElse(name, fail(s"$fixture: $name"))
        assert(e.size == want.length.toLong, s"$fixture $name size")
        assert(e.method == method, s"$fixture $name method")
        assert(d.isDefined, s"$fixture $name extraction")
        assert(java.util.Arrays.equals(d.get, want),
          s"$fixture $name bytes")
      }
    }
  }

  test("libarchive project fixture: multi-substream LZMA2 folder " +
      "and a directory entry") {
    val b = resource("libarchive_ref.7z")
    val all = SevenZip.extractAll(b).get
    assert(all.length == 3)
    val byName = all.map { case (e, d) => e.name -> (e, d) }.toMap
    val (dir, dirData) = byName("7zip-archive")
    assert(dir.method == "empty" && dir.size == 0L)
    assert(dirData.exists(_.isEmpty))
    for ((n, text) <- Seq("7zip-archive/hello" -> "hello\n",
        "7zip-archive/world" -> "world\n")) {
      val (e, d) = byName(n)
      assert(e.size == 6L && e.method == "lzma2", n)
      assert(d.map(new String(_, "UTF-8")).contains(text), n)
    }
  }

  test("own writer round-trips all three coders with verified CRCs") {
    val members = Seq(
      ("plain.txt", ("copy member " * 10).getBytes("UTF-8"), 0),
      ("packed.txt", ("lzma2 stored-chunk member " * 2000)
        .getBytes("UTF-8"), 1),
      ("squeezed.txt", ("deflated member body " * 500)
        .getBytes("UTF-8"), 2),
      ("tiny.dat", Array[Byte](0, 1, 2, 3), 0))
    val b = SevenZip.write(members)
    val got = SevenZip.extractAll(b).get
    assert(got.map(_._1.name) == members.map(_._1))
    assert(got.map(_._1.method) ==
      Seq("store", "lzma2", "deflate", "store"))
    for (((e, d), (_, want, _)) <- got.zip(members)) {
      assert(e.size == want.length.toLong, e.name)
      assert(d.isDefined && java.util.Arrays.equals(d.get, want),
        e.name)
    }
    // and bsdtar-written archives agree with the writer's layout
    // claims: the header CRC chain means one flipped byte anywhere
    // in the header region refuses
    val bad = b.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x40).toByte
    assert(SevenZip.entries(bad).isEmpty)
  }

  test("damage refuses structurally; member damage nulls only that " +
      "member") {
    val b = SevenZip.write(Seq(
      ("x.txt", ("first member " * 50).getBytes("UTF-8"), 2),
      ("y.txt", ("second member " * 50).getBytes("UTF-8"), 0)))
    // truncation → None
    assert(SevenZip.entries(b.take(20)).isEmpty)
    assert(SevenZip.entries(b.take(b.length / 2)).isEmpty)
    // magic damage → None
    val m = b.clone(); m(0) = 'X'
    assert(SevenZip.entries(m).isEmpty)
    // start-header CRC damage → None
    val c = b.clone(); c(8) = (c(8) ^ 1).toByte
    assert(SevenZip.entries(c).isEmpty)
    // flip a byte inside the FIRST pack stream: listing still works
    // (header is intact at the tail), extraction nulls x but not y
    val d = b.clone()
    d(32 + 3) = (d(32 + 3) ^ 0x10).toByte
    val es = SevenZip.entries(d)
    assert(es.isDefined && es.get.map(_.name) == Seq("x.txt",
      "y.txt"))
    val got = SevenZip.extractAll(d).get
    assert(got.head._2.isEmpty, "damaged member must null")
    assert(got(1)._2.isDefined, "intact member must survive")
    // null / junk
    assert(SevenZip.entries(null).isEmpty)
    assert(SevenZip.entries("not a sevenzip".getBytes).isEmpty)
  }

  test("unsupported coders refuse per-member, not per-archive") {
    // hand-patch the writer's copy coder id (0x00) to Delta (0x03):
    // same id size, so the header stays structurally valid but the
    // coder is one we must not pretend to decode
    val b = SevenZip.write(Seq(
      ("a.bin", Array.fill[Byte](64)(7), 0),
      ("b.bin", Array.fill[Byte](64)(9), 0)))
    // find the folder table: two copy coders encode as 01 00 within
    // the header; patch only the first
    val hdrStart = b.length - headerLen(b)
    var patched: Array[Byte] = null
    var i = hdrStart
    while (patched == null && i < b.length - 1) {
      if (b(i) == 0x01 && b(i + 1) == 0x00 && b(i - 1) == 0x01) {
        val c = b.clone()
        c(i + 1) = 0x03
        patched = c
      }
      i += 1
    }
    assert(patched != null, "copy coder bytes not found")
    fixHeaderCrc(patched)
    val got = SevenZip.extractAll(patched)
    assert(got.isDefined)
    assert(got.get.head._1.method == "delta")
    assert(got.get.head._2.isEmpty, "delta member must refuse")
    assert(got.get(1)._2.isDefined, "copy member must survive")
  }

  private def headerLen(b: Array[Byte]): Int = {
    var v = 0L
    for (i <- 0 until 8) v |= (b(20 + i) & 0xffL) << (8 * i)
    v.toInt
  }

  /** Recompute next-header + start-header CRCs after a patch. */
  private def fixHeaderCrc(b: Array[Byte]): Unit = {
    val hl = headerLen(b)
    val c = new java.util.zip.CRC32
    c.update(b, b.length - hl, hl)
    val v = c.getValue
    for (i <- 0 until 4) b(28 + i) = ((v >> (8 * i)) & 0xff).toByte
    val c2 = new java.util.zip.CRC32
    c2.update(b, 12, 20)
    val v2 = c2.getValue
    for (i <- 0 until 4) b(8 + i) = ((v2 >> (8 * i)) & 0xff).toByte
  }

  test("x86-BCJ + LZMA2 coder chains extract byte-exactly") {
    // an E8/E9-rich payload the BCJ filter genuinely transforms
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val body = {
      val out = new java.io.ByteArrayOutputStream()
      for (i <- 0 until 300) {
        out.write(0xE8)
        val v = i * 37 - 5000
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
        out.write(md.digest(("x" + i).getBytes).take(5))
      }
      out.toByteArray
    }
    val b = SevenZip.write(Seq(("code.bin", body, 3),
      ("plain.txt", "sibling member".getBytes("UTF-8"), 0)))
    val got = SevenZip.extractAll(b).get
    assert(got.head._1.method == "bcj+lzma2")
    assert(got.head._2.isDefined &&
      java.util.Arrays.equals(got.head._2.get, body))
    assert(got(1)._2.isDefined)
    // the BCJ filter is not a no-op on this payload: the pre-filter
    // bytes inside the archive differ from the raw body
    assert(!new String(b, "ISO-8859-1").contains(
      new String(body.take(64), "ISO-8859-1")))
  }
}
