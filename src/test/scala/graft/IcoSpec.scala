package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ico

/** ICO/CUR triage: round-trips across BMP and PNG-embedded
  * entries (embedded PNG dims override the entry bytes, including
  * the 256→0 encoding), cursors flag, span lies refuse, total.
  */
class IcoSpec extends AnyFunSuite {

  test("a mixed icon round-trips with PNG dims overriding") {
    val b = Ico.icoWrite(cursor = false, Seq(
      (16, 4, false), (32, 24, false), (48, 32, true)))
    val m = Ico.icoMeta(b).get
    assert(!m.isCursor && m.nEntries == 3)
    assert(m.maxWidth == 48 && m.maxHeight == 48)
    assert(m.nPng == 1 && m.bpps == Seq(4, 24, 32))
  }

  test("a 256-pixel entry round-trips the 0 encoding") {
    val b = Ico.icoWrite(cursor = false, Seq((256, 32, true)))
    val m = Ico.icoMeta(b).get
    assert(m.maxWidth == 256 && m.maxHeight == 256 && m.nPng == 1)
  }

  test("cursors flag; span lies refuse") {
    assert(Ico.icoMeta(Ico.icoWrite(cursor = true,
      Seq((16, 1, false)))).get.isCursor)
    val good = Ico.icoWrite(cursor = false, Seq((16, 4, false)))
    assert(Ico.icoMeta(null).isEmpty)
    assert(Ico.icoMeta(good.take(10)).isEmpty)
    val lying = good.clone()
    lying(14) = 0x7f // entry size → past the file
    assert(Ico.icoMeta(lying).isEmpty)
    val badType = good.clone(); badType(2) = 9
    assert(Ico.icoMeta(badType).isEmpty)
  }

  test("the walk is total over mutated bytes") {
    val base = Ico.icoWrite(cursor = false, Seq(
      (16, 4, false), (48, 32, true)))
    val rnd = new scala.util.Random(247)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Ico.icoMeta(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      Ico.icoMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
