package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Brotli

/** The brotli decoder pinned against GOLDEN streams produced by the
  * reference brotli implementation (Google's, via Node v20's zlib
  * binding) across qualities 0–11, windows 10–24 and all three
  * encoder modes — these exercise complex prefix codes, context
  * maps with IMTF, block-type switching, backward references
  * across meta-blocks, and (the q11 text streams) the static
  * dictionary with word transforms. A wrong bit in any extracted
  * normative table (dictionary, context LUTs, transforms) fails
  * these decodes, so the Appendix-A/B data is verified, not
  * trusted.
  */
/** Byte-deterministic payloads shared between the spec and the
  * golden-regeneration tool (no unicode literals, which can drift in
  * normalization between files).
  */
object BrotliSpec {
  val pinnedText: Array[Byte] = {
    val unit = "the pinned payload with repeated repeated words " +
      "for the lz stage and <a href=\"http://www.example.com/\">" +
      "markup</a> 0123456789 "
    (unit * 120).getBytes("US-ASCII")
  }
  val pinnedRuns: Array[Byte] = (0 until 3000).flatMap(i =>
    Seq.fill((i * 7) % 13 + 1)((i % 256).toByte)).toArray
}

class BrotliSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val goldens = Seq(
    ("text.bin", "text_q1_w22.br"),
    ("text.bin", "text_q5_w16.br"),
    ("text.bin", "text_q11_w22.br"),
    ("text.bin", "text_q11_w10.br"),
    ("text.bin", "text_q10_w24_font.br"),
    ("utf8.bin", "utf8_q9_w18.br"),
    ("utf8.bin", "utf8_q11_w22_text.br"),
    ("random.bin", "random_q5_w22.br"),
    ("runs.bin", "runs_q11_w22.br"),
    ("tiny.bin", "tiny_q11_w22.br"),
    ("varied.bin", "varied_q11_w22.br"),
    ("varied.bin", "varied_q7_w18.br"),
    ("mixed.bin", "mixed_q11_w22.br"),
    ("mixed.bin", "mixed_q2_w16.br"))

  test("reference-encoder golden streams decode bit-exactly") {
    for ((binName, brName) <- goldens) {
      val want = resource(binName)
      val got = Brotli.decompress(resource(brName))
      assert(got.isDefined, s"$brName failed to decode")
      assert(java.util.Arrays.equals(got.get, want),
        s"$brName: ${got.get.length} bytes != ${want.length}")
    }
  }

  test("the empty stream decodes to empty") {
    assert(Brotli.decompress(resource("empty_q11_w22.br"))
      .exists(_.isEmpty))
    // the canonical 1-byte empty stream (WBITS+ISLAST+ISLASTEMPTY)
    assert(Brotli.decompress(Array(0x3b.toByte)).exists(_.isEmpty))
  }

  test("malformed streams refuse, never throw or emit garbage") {
    assert(Brotli.decompress(null).isEmpty)
    assert(Brotli.decompress(Array.emptyByteArray).isEmpty)
    assert(Brotli.decompress("definitely not brotli at all"
      .getBytes("UTF-8")).isEmpty)
    val good = resource("varied_q11_w22.br")
    // truncations at every eighth boundary
    var n = 1
    while (n < good.length) {
      val got = Brotli.decompress(good.take(n))
      // refusal or a shorter-than-full prefix — never a throw
      got.foreach(g => assert(g.length <= resource("varied.bin").length))
      n += math.max(1, good.length / 64)
    }
    // output-size bound respected
    assert(Brotli.decompress(resource("text_q11_w22.br"),
      maxOut = 1000).isEmpty)
  }

  test("own encoder round-trips and matches its reference-verified " +
      "goldens") {
    val rnd = new scala.util.Random(5)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "tiny" -> "a".getBytes("UTF-8"),
      "text" -> ("the quick brown fox jumps over the lazy dog " * 400)
        .getBytes("UTF-8"),
      "utf8" -> ("ünïcödé Ωμέγα 中文 данные " * 300).getBytes("UTF-8"),
      "random" -> Array.fill[Byte](50000)(rnd.nextInt(256).toByte),
      "runs" -> (0 until 3000).flatMap(i =>
        Seq.fill((i * 7) % 13 + 1)((i % 256).toByte)).toArray,
      "big" -> ("lorem ipsum dolor sit amet consectetur adipiscing " +
        "elit sed do eiusmod tempor " * 3000).getBytes("UTF-8"))
    for ((name, data) <- cases) {
      assert(Brotli.decompress(Brotli.encodeStored(data))
        .exists(_.sameElements(data)), s"$name stored")
      assert(Brotli.decompress(Brotli.encodeEntropy(data))
        .exists(_.sameElements(data)), s"$name entropy")
    }
    // the committed outputs were decoded bit-exactly by the
    // reference brotli implementation when generated; regeneration
    // must stay byte-identical so that verification keeps meaning
    assert(Brotli.encodeEntropy(BrotliSpec.pinnedText)
      .sameElements(resource("own_text_entropy.br")))
    assert(Brotli.encodeEntropy(BrotliSpec.pinnedRuns)
      .sameElements(resource("own_runs_entropy.br")))
  }

  test("decoder is total under golden-stream mutation") {
    val rnd = new scala.util.Random(0xB70771L)
    for (base <- Seq("varied_q11_w22.br", "mixed_q2_w16.br",
      "text_q5_w16.br")) {
      val good = resource(base)
      for (i <- 0 until 400) {
        val m = good.clone()
        val k = 1 + rnd.nextInt(3)
        for (_ <- 0 until k)
          m(rnd.nextInt(m.length)) =
            (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
        Brotli.decompress(m) // decode or refuse, never throw
      }
      for (_ <- 0 until 100) {
        Brotli.decompress(good.take(1 + rnd.nextInt(good.length)))
        val at = rnd.nextInt(good.length)
        val junk = Array.fill[Byte](1 + rnd.nextInt(9))(
          rnd.nextInt(256).toByte)
        Brotli.decompress(good.take(at) ++ junk ++ good.drop(at))
      }
    }
  }
}
