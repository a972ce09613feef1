package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SafeTensors

/** SafeTensors triage: a hand-assembled known-byte literal parses
  * to its planted facts; the writer round-trips; every validation
  * the reference loader performs (span bounds, size = shape ×
  * itemsize, exact gap-free tiling) refuses on violation; the
  * parse is total.
  */
class SafeTensorsSpec extends AnyFunSuite {

  test("a known-byte literal parses to its planted facts") {
    val header =
      """{"w":{"dtype":"F32","shape":[2,3],"data_offsets":[0,24]},""" +
      """"b":{"dtype":"I8","shape":[4],"data_offsets":[24,28]}}"""
    val hb = header.getBytes("UTF-8")
    val out = new Array[Byte](8 + hb.length + 28)
    var i = 0
    while (i < 8) {
      out(i) = ((hb.length.toLong >> (8 * i)) & 0xff).toByte; i += 1
    }
    System.arraycopy(hb, 0, out, 8, hb.length)
    val m = SafeTensors.stMeta(out).get
    assert(m.nTensors == 2 && m.totalParams == 10 &&
      m.totalBytes == 28 && m.dtypes == Seq("F32", "I8") &&
      m.maxRank == 2 && !m.hasMetadata)
  }

  test("the writer round-trips: layers, metadata, scalars, " +
      "zero dims") {
    val a = SafeTensors.stMeta(SafeTensors.stWrite(Seq(
      ("l0.w", "F32", Seq(3L, 4L)), ("l0.b", "F16", Seq(3L))))).get
    assert(a.nTensors == 2 && a.totalParams == 15 &&
      a.totalBytes == 54 && a.dtypes == Seq("F16", "F32"))
    val b = SafeTensors.stMeta(SafeTensors.stWrite(
      Seq(("e", "BF16", Seq(4L, 8L))),
      Some(Map("format" -> "pt")))).get
    assert(b.hasMetadata && b.totalParams == 32)
    val c = SafeTensors.stMeta(SafeTensors.stWrite(Seq(
      ("s", "F64", Seq.empty), ("z", "U8", Seq(0L, 4L))))).get
    assert(c.nTensors == 2 && c.totalParams == 1 &&
      c.totalBytes == 8 && c.maxRank == 2)
  }

  test("span lies refuse: overlap, gap, slack, size mismatch, " +
      "unknown dtype") {
    def make(header: String, dataLen: Int): Array[Byte] = {
      val hb = header.getBytes("UTF-8")
      val out = new Array[Byte](8 + hb.length + dataLen)
      var i = 0
      while (i < 8) {
        out(i) = ((hb.length.toLong >> (8 * i)) & 0xff).toByte; i += 1
      }
      System.arraycopy(hb, 0, out, 8, hb.length)
      out
    }
    // overlap
    assert(SafeTensors.stMeta(make(
      """{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]},""" +
      """"b":{"dtype":"U8","shape":[4],"data_offsets":[2,6]}}""",
      6)).isEmpty)
    // gap
    assert(SafeTensors.stMeta(make(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]},""" +
      """"b":{"dtype":"U8","shape":[2],"data_offsets":[4,6]}}""",
      6)).isEmpty)
    // slack after the last span
    assert(SafeTensors.stMeta(make(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]}}""",
      5)).isEmpty)
    // size != shape × itemsize
    assert(SafeTensors.stMeta(make(
      """{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,6]}}""",
      6)).isEmpty)
    // unknown dtype
    assert(SafeTensors.stMeta(make(
      """{"a":{"dtype":"F4","shape":[2],"data_offsets":[0,1]}}""",
      1)).isEmpty)
    // header length lying past the file
    val good = SafeTensors.stWrite(Seq(("a", "U8", Seq(2L))))
    val lying = good.clone(); lying(0) = -1
    assert(SafeTensors.stMeta(lying).isEmpty)
    assert(SafeTensors.stMeta(null).isEmpty)
    assert(SafeTensors.stMeta(good.take(7)).isEmpty)
  }

  test("the parse is total over mutated bytes") {
    val base = SafeTensors.stWrite(Seq(
      ("l0.w", "F32", Seq(3L, 4L)), ("l0.b", "F16", Seq(3L))),
      Some(Map("k" -> "v")))
    val rnd = new scala.util.Random(230)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      SafeTensors.stMeta(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      SafeTensors.stMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
