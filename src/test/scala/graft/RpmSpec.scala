package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rpm

/** RPM triage: the writer round-trips lead/header/payload across
  * all three house compressors; header-structure lies refuse; an
  * unsupported compressor refuses honestly; the walk is total.
  */
class RpmSpec extends AnyFunSuite {

  test("round-trip across gzip, xz and zstd payloads") {
    Seq("gzip", "xz", "zstd").foreach { c =>
      val b = Rpm.rpmWrite("tool", "2.1", "7", "x86_64", c, Seq(
        ("./usr/bin/tool", "binary body".getBytes),
        ("./usr/share/doc/README", "docs".getBytes)))
      val m = Rpm.rpmMeta(b).get
      assert(m.name == "tool" && m.version == "2.1" &&
        m.release == "7" && m.arch == "x86_64", c)
      assert(m.compressor == c && !m.isSource, c)
      assert(m.nEntries == 2, c)
      assert(m.entryNames == Seq("./usr/bin/tool",
        "./usr/share/doc/README"), c)
    }
  }

  test("an unsupported compressor refuses honestly") {
    val b = Rpm.rpmWrite("x", "1", "1", "noarch", "lzma",
      Seq(("./f", "c".getBytes)))
    assert(Rpm.rpmMeta(b).isEmpty)
  }

  test("damage refuses: lead magic, header magic, torn store") {
    val good = Rpm.rpmWrite("p", "1", "1", "noarch", "gzip",
      Seq(("./f", "c".getBytes)))
    assert(Rpm.rpmMeta(null).isEmpty)
    assert(Rpm.rpmMeta(good.take(90)).isEmpty)
    val badLead = good.clone(); badLead(0) = 0
    assert(Rpm.rpmMeta(badLead).isEmpty)
    val badHdr = good.clone(); badHdr(96) = 0
    assert(Rpm.rpmMeta(badHdr).isEmpty)
    assert(Rpm.rpmMeta(good.dropRight(4)).isEmpty) // torn payload
  }

  test("the walk is total over mutated bytes") {
    val base = Rpm.rpmWrite("fuzz", "3.2", "1", "x86_64", "zstd",
      Seq(("./a", "alpha".getBytes), ("./b", "beta".getBytes)))
    val rnd = new scala.util.Random(243)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Rpm.rpmMeta(m) // must not throw
    }
    (0 until 40).foreach { _ =>
      Rpm.rpmMeta(base.take(rnd.nextInt(base.length)))
    }
  }
}
