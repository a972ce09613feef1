package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snappy

/** From-spec snappy block codec pinned BOTH directions against the
  * snappy-java implementation on Spark's classpath (an independent
  * reference): its copy-rich compressed output must decode
  * byte-exactly here, and this repo's literal-only streams must
  * decompress there.
  */
class SnappySpec extends AnyFunSuite {

  private def payloads: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "x".getBytes("UTF-8"),
    ("the quick brown fox jumps over the lazy dog " * 100)
      .getBytes("UTF-8"),
    ("abcabcabcabc" * 400).getBytes("UTF-8"), // short-period copies
    Array.tabulate[Byte](10000)(i => (i * 131 % 251).toByte),
    {
      // sha-derived incompressible bytes
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val out = new java.io.ByteArrayOutputStream()
      var x = "seed".getBytes
      for (_ <- 0 until 200) { x = md.digest(x); out.write(x, 0, 32) }
      out.toByteArray
    },
    Array.fill[Byte](70000)(0x41) // long runs, multi-tag literals
  )

  test("reference-compressed streams decode byte-exactly") {
    for ((p, i) <- payloads.zipWithIndex) {
      val c = org.xerial.snappy.Snappy.compress(p)
      val got = Snappy.decompress(c)
      assert(got.isDefined, s"payload $i refused")
      assert(java.util.Arrays.equals(got.get, p), s"payload $i bytes")
    }
  }

  test("own literal-only streams decompress in the reference") {
    for ((p, i) <- payloads.zipWithIndex) {
      val c = Snappy.compressStored(p)
      assert(java.util.Arrays.equals(
        org.xerial.snappy.Snappy.uncompress(c), p), s"payload $i")
      // and in our own decoder
      assert(Snappy.decompress(c).exists(
        java.util.Arrays.equals(_, p)), s"payload $i self")
    }
  }

  test("damage refuses: length lies, bad offsets, truncation") {
    val p = ("snappy damage target " * 50).getBytes("UTF-8")
    val c = org.xerial.snappy.Snappy.compress(p)
    assert(Snappy.decompress(null).isEmpty)
    assert(Snappy.decompress(Array.emptyByteArray).isEmpty)
    assert(Snappy.decompress(c.take(c.length / 2)).isEmpty)
    val lenLie = c.clone()
    lenLie(0) = (lenLie(0) ^ 1).toByte // uncompressed-length lie
    assert(Snappy.decompress(lenLie).isEmpty ||
      !java.util.Arrays.equals(Snappy.decompress(lenLie).get, p))
    // a copy offset pointing before the stream start
    val evil = Snappy.compressStored("abcd".getBytes) ++
      Array[Byte](0, 0, 0) // trailing garbage tags
    assert(Snappy.decompress(evil).isEmpty)
  }

  test("decoder is total under random mutation") {
    val rnd = new scala.util.Random(0x5AA9)
    val valid = org.xerial.snappy.Snappy.compress(
      ("mutation corpus for the snappy decoder " * 40).getBytes)
    for (_ <- 0 until 200) {
      val m = valid.clone()
      val k = 1 + rnd.nextInt(3)
      for (_ <- 0 until k) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try Snappy.decompress(m)
      catch {
        case e: Throwable =>
          fail(s"threw ${e.getClass.getSimpleName}")
      }
    }
  }
}
