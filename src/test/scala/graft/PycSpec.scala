package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pyc

/** .pyc census: fixtures compiled by CPython 3.11.7's own
  * py_compile (both invalidation modes) replay the facts marshal
  * recorded at generation time; the writer round-trips; unknown
  * magics get version-only triage; damage refuses; total.
  */
class PycSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pyc/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("the CPython timestamp fixture replays marshal's facts") {
    val f = Pyc.pycFacts(resource("fx_ts.pyc")).get
    assert(f.version == "3.11")
    assert(f.invalidation == "timestamp")
    assert(f.sourceSize.contains(193L))
    assert(f.topName.contains("<module>"))
    assert(f.names.contains(Seq("__doc__", "CONST", "NAMES",
      "str", "greet", "Thing")))
    assert(f.nConsts.contains(10))
    // module + greet + Thing-body + ping = 4 code objects
    assert(f.nCode.contains(4))
  }

  test("the CPython checked-hash fixture flags its mode") {
    val f = Pyc.pycFacts(resource("fx_hash.pyc")).get
    assert(f.invalidation == "checked_hash")
    assert(f.sourceSize.isEmpty)
    assert(f.names.contains(Seq("__doc__", "CONST", "NAMES",
      "str", "greet", "Thing")))
  }

  test("the writer round-trips planted shapes") {
    val f = Pyc.pycFacts(Pyc.pycWrite(Seq("alpha", "beta"), 3,
      hashBased = false, sourceSize = 321L)).get
    assert(f.version == "3.11" && f.invalidation == "timestamp")
    assert(f.sourceSize.contains(321L))
    assert(f.names.contains(Seq("alpha", "beta")))
    assert(f.nConsts.contains(3) && f.nCode.contains(1))
    val h = Pyc.pycFacts(Pyc.pycWrite(Seq.empty, 0,
      hashBased = true, sourceSize = 0L)).get
    assert(h.invalidation == "checked_hash" &&
      h.names.contains(Seq.empty))
  }

  test("an unknown-version magic gets version-only triage") {
    val b = Pyc.pycWrite(Seq("x"), 1, hashBased = false,
      sourceSize = 9L)
    // rewrite the magic to 3.12's 3531 = 0x0dcb
    b(0) = 0xcb.toByte; b(1) = 0x0d
    val f = Pyc.pycFacts(b).get
    assert(f.version == "3.12" && f.nCode.isEmpty &&
      f.names.isEmpty)
    // and a magic outside the table refuses
    val alien = b.clone(); alien(0) = 1; alien(1) = 1
    assert(Pyc.pycFacts(alien).isEmpty)
  }

  test("damage refuses; the walk is total") {
    val good = Pyc.pycWrite(Seq("a", "b"), 2, hashBased = false,
      sourceSize = 50L)
    assert(Pyc.pycFacts(null).isEmpty)
    assert(Pyc.pycFacts(good.take(10)).isEmpty)
    assert(Pyc.pycFacts(good.dropRight(1)).isEmpty)
    assert(Pyc.pycFacts(good :+ 0.toByte).isEmpty)
    val bases = Seq(good, resource("fx_ts.pyc"))
    val rnd = new scala.util.Random(242)
    bases.foreach { base =>
      (0 until 150).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        Pyc.pycFacts(m) // must not throw
      }
      (0 until 30).foreach { _ =>
        Pyc.pycFacts(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
