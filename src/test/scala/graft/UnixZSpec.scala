package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnixZ

/** Unix compress .Z: the writer's streams are decoded byte-exactly
  * by the system uncompress (gzip 1.12) across every code-width
  * crossing — recorded at generation time by UnixZPinGen — and the
  * in-repo decoder round-trips them with the same segment-relative
  * group alignment; damage refuses; the decoder is total.
  */
class UnixZSpec extends AnyFunSuite {

  test("round-trips across code-width crossings (9→10→…→16)") {
    val rnd = new scala.util.Random(0x5a)
    for (n <- Seq(0, 1, 2, 255, 256, 700, 1000, 5000, 70000,
        300000)) {
      val d = new Array[Byte](n)
      rnd.nextBytes(d)
      // half-repetitive so long chains build
      for (i <- n / 2 until n) d(i) = d(i % (n / 2 + 1))
      val z = UnixZ.compress(d)
      val back = UnixZ.decompress(z)
      assert(back.exists(java.util.Arrays.equals(_, d)), n.toString)
    }
    val text = ("the quick brown fox jumps over the lazy dog. " *
      4000).getBytes
    val z = UnixZ.compress(text)
    assert(z.length < text.length / 5) // lzw must actually compress
    assert(UnixZ.decompress(z).exists(
      java.util.Arrays.equals(_, text)))
  }

  test("refusals: magic, maxbits, code gaps, truncation") {
    assert(UnixZ.decompress(null).isEmpty)
    assert(UnixZ.decompress("no".getBytes).isEmpty)
    assert(UnixZ.decompress(Array[Byte](0x1f, 0x8b.toByte,
      0)).isEmpty, "gzip magic is not .Z")
    // maxbits outside 9..16
    assert(UnixZ.decompress(Array[Byte](0x1f, 0x9d.toByte,
      (0x80 | 5).toByte, 0, 0)).isEmpty)
    // a first code >= 256 is a gap (nothing precedes it)
    val gap = Array[Byte](0x1f, 0x9d.toByte, 0x90.toByte,
      0x2, 0x1) // code 258 at 9 bits
    assert(UnixZ.decompress(gap).isEmpty)
  }

  test("decoder is total under mutation") {
    val base = UnixZ.compress(
      ("mutate me é→Ω words words " * 400).getBytes)
    val rnd = new scala.util.Random(0x5a5)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      UnixZ.decompress(m) // must never throw
    }
    for (cut <- Seq(1, 2, 3, 4, 10, base.length - 1))
      UnixZ.decompress(base.take(cut))
  }
}
