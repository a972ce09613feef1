package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cfb, Ppt}

/** Legacy .ppt extraction: the record-tree walk, both text-atom
  * encodings, \r / U+000B normalization, slide census, honest
  * refusals (encryption token, CryptSession10, structural damage).
  */
class PptSpec extends AnyFunSuite {

  test("latin-1 slides use the bytes atom and round-trip") {
    val doc = Ppt.pptText(Ppt.pptWrite(Seq("hello deck", "2nd"))).get
    assert(doc.text == "hello deck\n2nd")
    assert(doc.nSlides == 2)
    assert(doc.nTextAtoms == 2)
  }

  test("non-latin-1 slides use the UTF-16LE chars atom") {
    val t = "Σαλαμάνδρα — 火蜥蜴"
    val doc = Ppt.pptText(Ppt.pptWrite(Seq(t))).get
    assert(doc.text == t)
    assert(doc.nSlides == 1)
  }

  test("newlines ride the wire as \\r and come back as \\n") {
    val doc = Ppt.pptText(Ppt.pptWrite(Seq("a\nb\nc"))).get
    assert(doc.text == "a\nb\nc")
  }

  test("surrogate pairs survive the chars atom") {
    val t = "ab😀𝄞cd"
    assert(Ppt.pptText(Ppt.pptWrite(Seq(t))).get.text == t)
  }

  test("empty slides yield empty atoms, join still holds") {
    val doc = Ppt.pptText(Ppt.pptWrite(Seq("", "x", ""))).get
    assert(doc.text == "\nx\n")
    assert(doc.nTextAtoms == 3)
    assert(doc.nSlides == 3)
  }

  test("a U+000B soft break in a bytes atom normalizes to \\n") {
    // hand-build: TextBytesAtom with an embedded vertical tab
    val body = "onetwo".map(_.toByte).toArray
    val stream = {
      val b = new Array[Byte](8 + body.length)
      b(2) = 0xa8.toByte; b(3) = 0x0f // RT_TextBytesAtom
      b(4) = body.length.toByte
      System.arraycopy(body, 0, b, 8, body.length)
      b
    }
    val bytes = Cfb.cfbWrite(Seq(("PowerPoint Document", stream)))
    assert(Ppt.pptText(bytes).get.text == "one\ntwo")
  }

  test("refusals: non-CFB, missing stream, encrypted token, crypt container") {
    assert(Ppt.pptText(null).isEmpty)
    assert(Ppt.pptText("nope".getBytes).isEmpty)
    assert(Ppt.pptText(Cfb.cfbWrite(Seq(
      ("WordDocument", "x".getBytes)))).isEmpty)
    // flip the Current User headerToken to the encrypted magic
    val good = Ppt.pptWrite(Seq("secret"))
    val doc = Cfb.cfbStreams(good).get
    val cu = doc.streams.find(_.name == "Current User").get.data
      .clone()
    cu(12) = 0xdf.toByte; cu(13) = 0xc4.toByte
    cu(14) = 0xd1.toByte; cu(15) = 0xf3.toByte
    val enc = Cfb.cfbWrite(Seq(
      ("Current User", cu),
      ("PowerPoint Document",
        doc.streams.find(_.name == "PowerPoint Document").get.data)))
    assert(Ppt.pptText(enc).isEmpty)
    // a CryptSession10Container anywhere in the stream refuses
    val crypt = {
      val b = new Array[Byte](8)
      b(0) = 0x0f; b(2) = 0x14; b(3) = 0x2f
      b
    }
    assert(Ppt.pptText(Cfb.cfbWrite(Seq(
      ("PowerPoint Document", crypt)))).isEmpty)
  }

  test("structural damage refuses: overrunning recLen, partial header") {
    // recLen overruns the stream
    val over = {
      val b = new Array[Byte](8)
      b(2) = 0xa8.toByte; b(3) = 0x0f
      b(4) = 0x40 // claims 64 bytes, has 0
      b
    }
    assert(Ppt.pptText(Cfb.cfbWrite(Seq(
      ("PowerPoint Document", over)))).isEmpty)
    // trailing partial header
    val partial = new Array[Byte](5)
    assert(Ppt.pptText(Cfb.cfbWrite(Seq(
      ("PowerPoint Document", partial)))).isEmpty)
  }

  test("decoder is total under mutation") {
    val base = Ppt.pptWrite(Seq("mutation target é€", "slide Ω 2"))
    val rnd = new scala.util.Random(2424)
    for (_ <- 0 until 300) {
      val b = base.clone()
      val n = 1 + rnd.nextInt(4)
      for (_ <- 0 until n)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Ppt.pptText(b) // must not throw
    }
  }
}
