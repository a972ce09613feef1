package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Npy

/** NumPy triage: the committed fixtures are written by numpy 1.26.4
  * itself (`tools/npy_pin.py` — the reference writer); the parser
  * must replay numpy's recorded facts (version, descr, order,
  * shape, itemsize, data CRC32, exact integer sum) bit-exactly.
  * Structured dtypes refuse; the writer round-trips; damage refuses;
  * the walk is total.
  */
class NpySpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/npy/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("numpy-written .npy fixtures replay numpy's recorded facts") {
    // (file, version, descr, fortran, shape, itemsize, crc32, sum)
    val expected = Seq(
      ("fx0.npy", "1.0", "<i8", false, "100", 8,
        1911013890L, Some(4950L)),
      ("fx1.npy", "1.0", "<f8", false, "10x3", 8,
        2163245944L, None),
      ("fx2.npy", "1.0", "|b1", false, "50", 1,
        3401869938L, Some(17L)),
      ("fx3.npy", "2.0", ">i4", false, "7", 4,
        1276271975L, Some(63L)),
      ("fx4.npy", "1.0", "<i4", true, "6x7", 4,
        2724191910L, Some(861L)),
      ("fx5.npy", "1.0", "<f8", false, "", 8,
        2006080509L, None),
      ("fx6.npy", "1.0", "<U5", false, "3", 20,
        3130042632L, None))
    expected.foreach { case (f, v, d, fo, sh, item, crc, sum) =>
      val m = Npy.npyMeta(resource(f)).get
      assert(m.version == v, f)
      assert(m.descr == d, f)
      assert(m.fortran == fo, f)
      assert(m.shape.mkString("x") == sh, f)
      assert(m.itemSize == item, f)
      assert(m.dataCrc32 == crc, f)
      assert(m.intSum == sum, f)
    }
  }

  test("structured dtypes refuse rather than half-decode") {
    assert(Npy.npyMeta(resource("fx7.npy")).isEmpty)
  }

  test("numpy savez (stored) members parse through the zip walk") {
    val es = Npy.npzEntries(resource("fx8.npz")).get
    assert(es.map(_._1) == Seq("ints.npy", "mat.npy", "flags.npy"))
    val ints = es(0)._2.get
    assert(ints.descr == "<i8" && ints.shape == Seq(12L) &&
      ints.intSum.contains(66L))
    val mat = es(1)._2.get
    assert(mat.descr == "<f4" && mat.shape == Seq(3L, 4L) &&
      mat.intSum.isEmpty)
    val flags = es(2)._2.get
    assert(flags.descr == "|b1" && flags.intSum.contains(2L))
  }

  test("numpy savez_compressed (deflate) members parse") {
    val es = Npy.npzEntries(resource("fx9.npz")).get
    assert(es.map(_._1) == Seq("big.npy", "name.npy"))
    val big = es(0)._2.get
    assert(big.descr == "<i2" && big.shape == Seq(1000L) &&
      big.intSum.contains(0L))
    assert(es(1)._2.get.descr == "<U1")
  }

  test("the writer round-trips planted facts in both versions") {
    val data = Array.tabulate[Byte](24)(i => i.toByte)
    val v1 = Npy.npyMeta(
      Npy.npyWrite("<i4", fortran = false, Seq(6L), data)).get
    assert(v1.version == "1.0" && v1.nElems == 6 &&
      v1.shape == Seq(6L))
    val v2 = Npy.npyMeta(Npy.npyWrite("<u2", fortran = true,
      Seq(3L, 4L), data, v2 = true)).get
    assert(v2.version == "2.0" && v2.fortran && v2.nElems == 12)
    // scalar: empty shape, one element
    val sc = Npy.npyMeta(Npy.npyWrite("<i8", fortran = false,
      Seq.empty, data.take(8))).get
    assert(sc.shape.isEmpty && sc.nElems == 1 &&
      sc.intSum.contains(0x0706050403020100L))
  }

  test("signed, unsigned and big-endian sums are exact") {
    // <i2 of [-1, -2, 3] → 0
    val i2 = Array[Byte](-1, -1, -2, -1, 3, 0)
    assert(Npy.npyMeta(Npy.npyWrite("<i2", fortran = false,
      Seq(3L), i2)).get.intSum.contains(0L))
    // <u2 of [0xFFFF] → 65535 (no sign extension)
    val u2 = Array[Byte](-1, -1)
    assert(Npy.npyMeta(Npy.npyWrite("<u2", fortran = false,
      Seq(1L), u2)).get.intSum.contains(65535L))
    // >i2 of [-1] big-endian → -1
    val bi = Array[Byte](-1, -1)
    assert(Npy.npyMeta(Npy.npyWrite(">i2", fortran = false,
      Seq(1L), bi)).get.intSum.contains(-1L))
  }

  test("damage refuses: magic, version, truncation, length drift") {
    val good = Npy.npyWrite("<i4", fortran = false, Seq(2L),
      Array[Byte](1, 0, 0, 0, 2, 0, 0, 0))
    assert(Npy.npyMeta(null).isEmpty)
    assert(Npy.npyMeta(Array.emptyByteArray).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 0x12
    assert(Npy.npyMeta(badMagic).isEmpty)
    val badVer = good.clone(); badVer(6) = 9
    assert(Npy.npyMeta(badVer).isEmpty)
    assert(Npy.npyMeta(good.take(good.length - 1)).isEmpty)
    assert(Npy.npyMeta(good :+ 0.toByte).isEmpty)
    // header dict with an unknown key refuses
    val alien = Npy.npyWrite("<i4", fortran = false, Seq(2L),
      Array[Byte](1, 0, 0, 0, 2, 0, 0, 0))
    val s = new String(alien, "ISO-8859-1")
      .replace("'descr'", "'descx'")
    assert(Npy.npyMeta(s.getBytes("ISO-8859-1")).isEmpty)
  }

  test("the parse is total over mutated fixture bytes") {
    val base = resource("fx0.npy")
    val rnd = new scala.util.Random(226)
    (0 until 160).foreach { _ =>
      val m = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Npy.npyMeta(m) // must not throw
      Npy.npzEntries(m)
    }
    (0 until 40).foreach { _ =>
      val m = base.take(rnd.nextInt(base.length))
      Npy.npyMeta(m)
    }
  }
}
