package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowIpc

/** Arrow IPC triage: the committed fixtures are written by pyarrow
  * 16.1.0 itself (`tools/arrow_pin.py` — the reference writer); the
  * flatbuffers walk must replay pyarrow's recorded facts — names,
  * type labels (dictionary encoding flagged), batch/dictionary
  * counts, exact total rows including zstd-compressed batches.
  * Damage refuses; the walk is total.
  */
class ArrowSpec extends AnyFunSuite {

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/arrow/fx$i.arrow")
    assert(in != null, s"missing fx$i")
    try in.readAllBytes() finally in.close()
  }

  test("pyarrow-written fixtures replay the recorded facts") {
    val want = Seq(
      ("id,name", "int64,utf8", 2, 0, 100L),
      ("v,ok,ts,u", "float64,bool,timestamp,uint32", 1, 0, 25L),
      ("xs,st", "list,struct", 1, 0, 30L),
      ("cat,n", "dict:utf8,int32", 1, 1, 20L),
      ("payload,k", "binary,int64", 3, 0, 150L))
    for ((w, i) <- want.zipWithIndex) {
      val m = ArrowIpc.arrowMeta(fixture(i)).get
      assert(m.version == 4, s"fx$i version") // MetadataVersion V5
      assert((m.names.mkString(","), m.types.mkString(","),
        m.nBatches, m.nDicts, m.rows) == w, s"fx$i")
    }
  }

  test("the zstd-compressed file's rows come from headers, " +
      "not bodies") {
    // fx4's three batches are zstd-compressed; the triage never
    // decompresses — exact rows prove the header path
    val m = ArrowIpc.arrowMeta(fixture(4)).get
    assert(m.rows == 150L && m.nBatches == 3)
  }

  test("damage refuses: magic, footer length lies, torn footer") {
    val good = fixture(0)
    assert(ArrowIpc.arrowMeta(null).isEmpty)
    assert(ArrowIpc.arrowMeta("ARROW1".getBytes).isEmpty)
    val noTail = good.clone()
    noTail(noTail.length - 1) = 'X'
    assert(ArrowIpc.arrowMeta(noTail).isEmpty)
    val lyingLen = good.clone()
    lyingLen(lyingLen.length - 10) = 0x7f
    lyingLen(lyingLen.length - 9) = 0x7f.toByte
    assert(ArrowIpc.arrowMeta(lyingLen).isEmpty)
    assert(ArrowIpc.arrowMeta(good.take(30)).isEmpty)
  }

  test("the flatbuffers walk is total under mutation") {
    val rnd = new scala.util.Random(229)
    for (i <- 0 until 5) {
      val base = fixture(i)
      for (_ <- 0 until 150) {
        val m = base.clone()
        // bias mutations into the footer where the flatbuffer lives
        val at = base.length - 1 - rnd.nextInt(
          math.min(base.length, 500))
        m(at) = (rnd.nextInt(256) - 128).toByte
        ArrowIpc.arrowMeta(m) // must never throw
      }
      for (_ <- 0 until 30) {
        ArrowIpc.arrowMeta(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
