package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gguf

/** GGUF triage: a hand-assembled v3 literal parses to its planted
  * facts; the writer round-trips across KV value types including
  * typed arrays; damage (bad magic/version, nested arrays, torn
  * strings, decreasing offsets) refuses; the parse is total.
  */
class GgufSpec extends AnyFunSuite {

  test("the writer round-trips planted architecture and tensors") {
    val b = Gguf.ggufWrite("llama", "tiny-test", 3, Seq(
      ("blk.0.w", Seq(32L, 16L), 12),
      ("blk.0.b", Seq(32L), 0),
      ("out", Seq(32L, 8L, 2L), 8)))
    val m = Gguf.ggufMeta(b).get
    assert(m.version == 3 && m.nTensors == 3 && m.nKv == 5)
    assert(m.arch == "llama" && m.name == "tiny-test")
    assert(m.totalParams == 32 * 16 + 32 + 32 * 8 * 2)
    assert(m.qtypes == Seq("F32", "Q4_K", "Q8_0"))
  }

  test("all KV value widths and string arrays skip correctly") {
    // extraKvs cycles u32 / bool / i32-array; a parse reaching the
    // tensor records at all proves the skips are exact
    (0 to 6).foreach { n =>
      val b = Gguf.ggufWrite("qwen2", "m", n,
        Seq(("t", Seq(4L), 30)))
      val m = Gguf.ggufMeta(b).get
      assert(m.nKv == 2 + n && m.totalParams == 4 &&
        m.qtypes == Seq("BF16"), s"extraKvs=$n")
    }
  }

  test("damage refuses: magic, version, nested array, offsets") {
    val good = Gguf.ggufWrite("llama", "x", 2,
      Seq(("a", Seq(4L), 0), ("b", Seq(2L), 0)))
    assert(Gguf.ggufMeta(null).isEmpty)
    assert(Gguf.ggufMeta("GGUF".getBytes).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Gguf.ggufMeta(badMagic).isEmpty)
    val badVer = good.clone(); badVer(4) = 9
    assert(Gguf.ggufMeta(badVer).isEmpty)
    assert(Gguf.ggufMeta(good.take(good.length - 3)).isEmpty)
    // a nested array (array of arrays) is not legal GGUF
    val w = new Gguf.Writer
    w.raw("GGUF".getBytes("US-ASCII")).u32(3L).u64(0L).u64(1L)
    w.str("k").u32(9L).u32(9L).u64(1L)
    assert(Gguf.ggufMeta(w.result()).isEmpty)
    // decreasing tensor offsets refuse
    val w2 = new Gguf.Writer
    w2.raw("GGUF".getBytes("US-ASCII")).u32(3L).u64(2L).u64(0L)
    w2.str("a").u32(1L).u64(4L).u32(0L).u64(64L)
    w2.str("b").u32(1L).u64(4L).u32(0L).u64(0L)
    assert(Gguf.ggufMeta(w2.result()).isEmpty)
  }

  test("the parse is total over mutated bytes") {
    val base = Gguf.ggufWrite("gptneox", "fuzz", 5, Seq(
      ("blk.0.w", Seq(8L, 4L), 8), ("blk.1.w", Seq(8L, 4L), 8)))
    val rnd = new scala.util.Random(231)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Gguf.ggufMeta(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      Gguf.ggufMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
