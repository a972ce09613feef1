package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pe, Sniff}

/** PE/COFF triage: the writer's images (read back by binutils'
  * independent BFD PE backend at generation time — PePinGen)
  * round-trip planted values in both widths; damage refuses; the
  * walk is total.
  */
class PeSpec extends AnyFunSuite {

  test("planted values round-trip in both widths") {
    val b = Pe.peWrite(is64 = true, isDll = false,
      Seq(".text", ".data"))
    val m = Pe.peMeta(b).get
    assert(m.machine == "x86_64" && m.is64 && !m.isDll)
    assert(m.subsystem == 3)
    assert(m.nSections == 2)
    assert(m.sectionNames == Seq(".text", ".data"))
    assert(Sniff.sniff(b) == "application/vnd.microsoft" +
      ".portable-executable")
    val d = Pe.peMeta(Pe.peWrite(is64 = false, isDll = true,
      Seq(".text", ".rdata", ".reloc"))).get
    assert(d.machine == "i386" && !d.is64 && d.isDll)
    assert(d.sectionNames == Seq(".text", ".rdata", ".reloc"))
  }

  test("refusals: MZ only, bad e_lfanew, wrong optional magic, " +
      "section table past the buffer") {
    val good = Pe.peWrite(is64 = true, isDll = false, Seq(".text"))
    assert(Pe.peMeta(good).isDefined)
    assert(Pe.peMeta(null).isEmpty)
    assert(Pe.peMeta("MZ this is a dos stub only".getBytes)
      .isEmpty)
    val badNew = good.clone()
    badNew(0x3c) = 0x7f; badNew(0x3d) = 0x7f
    assert(Pe.peMeta(badNew).isEmpty)
    val badOpt = good.clone()
    badOpt(0x40 + 24) = 0x0c // optional magic 0x10c: invalid
    assert(Pe.peMeta(badOpt).isEmpty)
    assert(Pe.peMeta(good.take(0x60)).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Pe.peWrite(is64 = false, isDll = true,
      (0 until 4).map(i => s".s$i"))
    val rnd = new scala.util.Random(0x9E)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Pe.peMeta(m) // must never throw
    }
  }
}
