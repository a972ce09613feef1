package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dbf

/** dBase .dbf reading: field descriptors, fixed-width decode,
  * deleted-row exclusion, exact integer numerics, refusals.
  */
class DbfSpec extends AnyFunSuite {

  test("rows round-trip with trailing-pad trim and exact ints") {
    val doc = Dbf.dbfRead(Dbf.dbfWrite(Seq(
      ("first", "body one", 100L),
      ("second", "body two longer", -7L)))).get
    assert(doc.fields.map(_.name) == Seq("TITLE", "BODY", "SEQ"))
    assert(doc.rows.length == 2)
    assert(doc.nDeleted == 1)
    assert(doc.rows(0) == IndexedSeq("first", "body one", 100L))
    assert(doc.rows(1) == IndexedSeq("second", "body two longer",
      -7L))
  }

  test("leading spaces survive, only trailing pads trim") {
    val doc = Dbf.dbfRead(Dbf.dbfWrite(Seq(
      ("  indented", "x", 1L), ("a", "y", 2L)))).get
    assert(doc.rows(0)(0) == "  indented")
  }

  test("the deleted decoy never reaches the rows") {
    val doc = Dbf.dbfRead(Dbf.dbfWrite(Seq(("a", "b", 1L)))).get
    assert(!doc.rows.exists(_.exists {
      case s: String => s.contains("DECOY")
      case _ => false
    }))
  }

  test("blank numeric is null, not zero") {
    val bytes = Dbf.dbfWrite(Seq(("a", "b", 1L)))
    // blank out the SEQ field of row 0 (last 10 bytes before flag
    // of the decoy record)
    val doc0 = Dbf.dbfRead(bytes).get
    val hdrSize = 32 + 3 * 32 + 1
    val recSize = 1 + doc0.fields.map(_.len).sum
    val seqOff = hdrSize + recSize - 10
    val b = bytes.clone()
    java.util.Arrays.fill(b, seqOff, seqOff + 10, ' '.toByte)
    val doc = Dbf.dbfRead(b).get
    assert(doc.rows(0)(2) == null)
  }

  test("refusals: version, memo field, size lies, bad numeric") {
    assert(Dbf.dbfRead(null).isEmpty)
    assert(Dbf.dbfRead("tiny".getBytes).isEmpty)
    val good = Dbf.dbfWrite(Seq(("a", "b", 1L), ("c", "d", 2L)))
    val v = good.clone(); v(0) = 0x42
    assert(Dbf.dbfRead(v).isEmpty)
    // memo type on field 1
    val m = good.clone(); m(32 + 11) = 'M'
    assert(Dbf.dbfRead(m).isEmpty)
    // record-size lie
    val rs = good.clone(); rs(10) = (rs(10) + 1).toByte
    assert(Dbf.dbfRead(rs).isEmpty)
    // non-numeric byte inside SEQ
    val hdrSize = 32 + 3 * 32 + 1
    val doc0 = Dbf.dbfRead(good).get
    val recSize = 1 + doc0.fields.map(_.len).sum
    val bn = good.clone()
    bn(hdrSize + recSize - 1) = 'x'
    assert(Dbf.dbfRead(bn).isEmpty)
    // truncation
    for (cut <- Seq(20, 40, good.length - 5)) {
      val c = java.util.Arrays.copyOf(good, cut)
      val r = Dbf.dbfRead(c)
      assert(r.isEmpty || r.isDefined) // total
    }
  }

  test("decoder is total under mutation") {
    val base = Dbf.dbfWrite(Seq(("mutate", "target rows", 42L),
      ("more", "data", 7L)))
    val rnd = new scala.util.Random(1199)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Dbf.dbfRead(b) // must not throw
    }
  }
}
