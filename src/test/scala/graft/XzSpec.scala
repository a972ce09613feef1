package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Xz

/** The xz/LZMA2/LZMA decoder pinned against GOLDEN streams from the
  * reference liblzma (presets 0/6/9/9e, all four check types,
  * multi-chunk, CLI-produced multi-BLOCK, multi-stream with
  * padding), plus the container-level fixture encoder (whose output
  * the reference xz tool verified at generation time) and damage
  * refusals.
  */
class XzSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/xz/$name")
    assert(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val goldens = Seq(
    ("text.bin", "text_p0_crc32.xz"),
    ("text.bin", "text_p9e_crc64.xz"),
    ("utf8.bin", "utf8_p6_sha256.xz"),
    ("random.bin", "random_p6_none.xz"),
    ("runs.bin", "runs_p9_crc64.xz"),
    ("big.bin", "big_p6_crc32.xz"),
    ("big.bin", "big_blocks_crc32.xz"), // xz CLI --block-size 64k
    ("tiny.bin", "tiny_p6_crc32.xz"),
    ("multistream.bin", "multistream.xz"))

  test("reference-encoder golden streams decode bit-exactly") {
    for ((binName, xzName) <- goldens) {
      val want = resource(binName)
      val got = Xz.decompress(resource(xzName))
      assert(got.isDefined, s"$xzName failed to decode")
      assert(java.util.Arrays.equals(got.get, want),
        s"$xzName: ${got.get.length} != ${want.length}")
    }
    assert(Xz.decompress(resource("empty_p6_crc32.xz"))
      .exists(_.isEmpty))
  }

  test("x86-BCJ and delta filter chains decode the reference CLI's " +
      "output bit-exactly (round 15)") {
    val x86 = resource("filters/x86ish.bin")
    val samples = resource("filters/samples.bin")
    for ((fx, want) <- Seq(
        ("filters/x86_bcj.xz", x86),
        ("filters/x86_bcj9.xz", x86),
        ("filters/delta1.xz", samples),
        ("filters/delta4.xz", samples))) {
      val got = Xz.decompress(resource(fx))
      assert(got.isDefined, s"$fx refused")
      assert(java.util.Arrays.equals(got.get, want), s"$fx bytes")
    }
    // a flipped payload byte still refuses through the check layer
    val b = resource("filters/x86_bcj.xz")
    val m = b.clone()
    m(40) = (m(40) ^ 0x20).toByte
    assert(Xz.decompress(m).isEmpty)
  }

  test("own container encoder round-trips and checks verify") {
    val rnd = new scala.util.Random(5)
    val cases = Seq(
      Array.emptyByteArray,
      "a".getBytes("UTF-8"),
      ("chunked text " * 400).getBytes("UTF-8"),
      Array.fill[Byte](70000)(rnd.nextInt(256).toByte), // 2 chunks
      Array.fill[Byte](131073)(7)) // 3 chunks
    for (data <- cases)
      assert(Xz.decompress(Xz.compress(data))
        .exists(_.sameElements(data)), s"len ${data.length}")
  }

  test("legacy LZMA_ALONE (.lzma) decodes via the end marker") {
    assert(Xz.decompressAlone(resource("text_alone.lzma"))
      .exists(_.sameElements(resource("text.bin"))))
    assert(Xz.decompressAlone(resource("runs_alone.lzma"))
      .exists(_.sameElements(resource("runs.bin"))))
    // damage refuses; never throws
    assert(Xz.decompressAlone(null).isEmpty)
    assert(Xz.decompressAlone("too short".getBytes).isEmpty)
    val good = resource("text_alone.lzma")
    assert(Xz.decompressAlone(good.take(good.length / 2)).isEmpty)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) =
        (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      Xz.decompressAlone(m)
    }
  }

  test("every check type actually rejects corruption") {
    // corrupt ONE payload byte in each golden; the check layer (or
    // the range coder) must refuse — never wrong bytes
    for (name <- Seq("text_p0_crc32.xz", "text_p9e_crc64.xz",
      "utf8_p6_sha256.xz")) {
      val good = resource(name)
      val want = Xz.decompress(good).get
      var refusedOrRight = 0
      for (at <- 20 until good.length - 16 by 3) {
        val m = good.clone()
        m(at) = (m(at) ^ 0x04).toByte
        Xz.decompress(m) match {
          case None => refusedOrRight += 1
          case Some(got) =>
            assert(java.util.Arrays.equals(got, want),
              s"$name flip@$at returned WRONG bytes undetected")
        }
      }
      assert(refusedOrRight > 0, name)
    }
  }

  test("malformed containers refuse; decoder total under mutation") {
    assert(Xz.decompress(null).isEmpty)
    assert(Xz.decompress("not xz at all, not even close".getBytes)
      .isEmpty)
    val good = resource("runs_p9_crc64.xz")
    assert(Xz.decompress(good.take(good.length / 2)).isEmpty)
    assert(Xz.decompress(good.take(11)).isEmpty)
    // output cap respected
    assert(Xz.decompress(resource("big_p6_crc32.xz"),
      maxOut = 1000).isEmpty)
    val rnd = new scala.util.Random(0xA2171L)
    for (_ <- 0 until 400) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) =
          (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      Xz.decompress(m) // refuse or decode, never throw
    }
    for (_ <- 0 until 100) {
      Xz.decompress(good.take(1 + rnd.nextInt(good.length)))
      val at = rnd.nextInt(good.length)
      val junk = Array.fill[Byte](1 + rnd.nextInt(9))(
        rnd.nextInt(256).toByte)
      Xz.decompress(good.take(at) ++ junk ++ good.drop(at))
    }
  }
}
