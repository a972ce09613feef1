package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pickle

/** Pickle census: the committed fixtures are written by CPython's
  * own pickle module at every protocol 0–5 (`tools/pickle_pin.py`);
  * the census must replay the facts pickletools recorded at
  * generation time — protocol, opcode count, top kind, container
  * length, globals, memo puts, frames. The machine never constructs
  * objects; damage refuses; the walk is total.
  */
class PickleSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pickle/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("CPython fixtures replay pickletools' recorded facts") {
    // (file, protocol, n_ops, kind, n_items, globals, memo, frames)
    val expected = Seq(
      ("fx0.pkl", 0, 47, "dict", Some(3),
        Seq("_codecs.encode"), 14, 0),
      ("fx1.pkl", 0, 41, "dict", Some(3),
        Seq("_codecs.encode"), 14, 0),
      ("fx2.pkl", 2, 40, "dict", Some(3),
        Seq("_codecs.encode"), 14, 0),
      ("fx3.pkl", 3, 32, "dict", Some(3), Seq.empty, 10, 0),
      ("fx4.pkl", 4, 33, "dict", Some(3), Seq.empty, 10, 1),
      ("fx5.pkl", 5, 33, "dict", Some(3), Seq.empty, 10, 1),
      ("fx6.pkl", 4, 20, "reduce", None,
        Seq("collections.OrderedDict"), 6, 1),
      ("fx7.pkl", 2, 19, "list", Some(3), Seq.empty, 4, 0))
    expected.foreach { case (f, p, ops, kind, items, globs, m, fr) =>
      val c = Pickle.pickleCensus(resource(f)).get
      assert(c.protocol == p, f)
      assert(c.nOps == ops, f)
      assert(c.topKind == kind, f)
      assert(c.nItems == items, f)
      assert(c.globals == globs, f)
      assert(c.nMemo == m, f)
      assert(c.nFrames == fr, f)
    }
  }

  test("the memo-reuse fixture resolves BINGET to the shared list") {
    // fx7 is [shared, shared, {'s': shared}] — the census sees the
    // top list reach 3 items only if BINGET pushes the memoized ref
    val c = Pickle.pickleCensus(resource("fx7.pkl")).get
    assert(c.topKind == "list" && c.nItems.contains(3))
  }

  test("the writers round-trip their planted closed forms") {
    val d = Pickle.pickleCensus(Pickle.writeDict2(41L, 4)).get
    assert(d.protocol == 2 && d.topKind == "dict" &&
      d.nItems.contains(4) && d.nOps == 5 + 2 * 4 && d.nMemo == 0)
    val l = Pickle.pickleCensus(Pickle.writeList4(7L, 3)).get
    assert(l.protocol == 4 && l.topKind == "list" &&
      l.nItems.contains(3) && l.nOps == 7 + 3 && l.nFrames == 1 &&
      l.nMemo == 1)
    val t = Pickle.pickleCensus(Pickle.writeTuple2(9L)).get
    assert(t.topKind == "tuple" && t.nItems.contains(3) &&
      t.nOps == 6)
    val r = Pickle.pickleCensus(Pickle.writeReduce2()).get
    assert(r.topKind == "reduce" && r.nItems.isEmpty &&
      r.globals == Seq("collections.OrderedDict") && r.nOps == 5)
    val d0 = Pickle.pickleCensus(Pickle.writeDict0(100L, 2)).get
    assert(d0.protocol == 0 && d0.topKind == "dict" &&
      d0.nItems.contains(2) && d0.nOps == 3 + 2 * 2)
  }

  test("damage refuses: trailing bytes, missing stop, bad opcode") {
    val good = Pickle.writeDict2(5L, 2)
    assert(Pickle.pickleCensus(null).isEmpty)
    assert(Pickle.pickleCensus(Array.emptyByteArray).isEmpty)
    assert(Pickle.pickleCensus(good :+ 'X'.toByte).isEmpty)
    assert(Pickle.pickleCensus(good.dropRight(1)).isEmpty)
    val bad = good.clone(); bad(2) = 0x7f // unknown opcode
    assert(Pickle.pickleCensus(bad).isEmpty)
    // unresolved memo get refuses
    assert(Pickle.pickleCensus(
      Array[Byte](0x80.toByte, 2, 'h', 9, '.')).isEmpty)
  }

  test("the census is total over mutated fixture bytes") {
    val bases = Seq(resource("fx4.pkl"), resource("fx0.pkl"),
      Pickle.writeList4(3L, 2))
    val rnd = new scala.util.Random(227)
    bases.foreach { base =>
      (0 until 120).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        Pickle.pickleCensus(m) // must not throw
      }
      (0 until 30).foreach { _ =>
        Pickle.pickleCensus(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
