package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cfb, Xls}

/** BIFF8 .xls extraction: the SST Continue-straddle rule (including a
  * mid-string width switch), every numeric cell encoding in exact
  * centi-units, sheet routing via lbPlyPos, honest refusals.
  */
class XlsSpec extends AnyFunSuite {

  private def textOf(doc: Xls.XlsDoc): String = {
    val sb = new StringBuilder
    doc.cells.foreach(c => if (c.text != null) sb.append(c.text))
    sb.toString
  }
  private def centiOf(doc: Xls.XlsDoc): Long =
    doc.cells.flatMap(_.centi).sum

  test("latin1 text round-trips through LABELSST + SST") {
    val t = "quarterly totals, line 1\nsecond line"
    val doc = Xls.xlsCells(Xls.xlsWrite(t, 7L)).get
    assert(doc.sheetNames == Seq("Data", "Numbers"))
    assert(textOf(doc) == t)
    assert(doc.nSharedStrings == 2)
  }

  test("wide (UTF-16) text round-trips") {
    val t = "Σαλαμάνδρα — 火蜥蜴 — саламандра"
    val doc = Xls.xlsCells(Xls.xlsWrite(t, 3L)).get
    assert(textOf(doc) == t)
  }

  test("the straddled string switches width mid-string") {
    // pieces: "XXXXaa€€" halves to "XXXX" + "aa€€"; the straddle
    // splits "aa€€" into a latin1 fragment and a wide fragment, so
    // the continue fragment's flag byte flips fHighByte
    val t = "XXXXaa€€"
    val bytes = Xls.xlsWrite(t, 1L)
    val doc = Xls.xlsCells(bytes).get
    assert(textOf(doc) == t)
    // prove the fixture actually exercises the switch: the SST blob
    // written for these pieces has a narrow first fragment
    val sst = Xls.sstWrite(Seq("XXXX", "aa€€"))
    // SST record, then one CONTINUE record
    val sstLen = (sst(2) & 0xff) | ((sst(3) & 0xff) << 8)
    val contOff = 4 + sstLen
    assert(((sst(contOff) & 0xff) |
      ((sst(contOff + 1) & 0xff) << 8)) == 0x003c, "continue record")
    assert((sst(contOff + 4) & 1) == 1, "continue fragment is wide")
  }

  test("surrogate pairs survive (never split across fragments)") {
    val t = "ab😀😀cd" // 😀 twice
    val doc = Xls.xlsCells(Xls.xlsWrite(t, 9L)).get
    assert(textOf(doc) == t)
  }

  test("empty and single-char texts") {
    for (t <- Seq("", "x", "€")) {
      val doc = Xls.xlsCells(Xls.xlsWrite(t, 2L)).get
      assert(textOf(doc) == t, s"text=$t")
    }
  }

  test("numeric cells: RK int, RK x100, MULRK, NUMBER — exact centi") {
    val seed = 11L
    val doc = Xls.xlsCells(Xls.xlsWrite("t", seed)).get
    // rk1: (7*seed+1)*100; rk2: 13*seed+3 (x100-flagged);
    // mulrk: (seed+5)*100 + (seed+6)*100; number: seed*2*100
    val want = (7 * seed + 1) * 100 + (13 * seed + 3) +
      (seed + 5) * 100 + (seed + 6) * 100 + seed * 2 * 100
    assert(centiOf(doc) == want)
    assert(doc.cells.count(_.centi.isDefined) == 5)
  }

  test("rkToCenti: every encoding, incl. refusal of inexact doubles") {
    // 30-bit int 42 -> 4200
    assert(Xls.rkToCenti((42L << 2) | 2L).contains(4200L))
    // negative int
    assert(Xls.rkToCenti(((-7L << 2) & 0xffffffffL) | 2L)
      .contains(-700L))
    // x100 int: stored 1234 means 12.34 -> 1234 centi
    assert(Xls.rkToCenti((1234L << 2) | 3L).contains(1234L))
    // truncated double 0.5 (top 32 bits of its IEEE form)
    val halfTop = java.lang.Double.doubleToLongBits(0.5) >>> 32
    assert(Xls.rkToCenti(halfTop & ~3L).contains(50L))
    // 1/3 is not centi-representable -> None
    val thirdTop = java.lang.Double.doubleToLongBits(1.0 / 3) >>> 32
    assert(Xls.rkToCenti(thirdTop & ~3L).isEmpty)
  }

  test("inline LABEL records decode (narrow and wide)") {
    def label(rw: Int, col: Int, s: String, wide: Boolean)
        : Array[Byte] = {
      val cb =
        if (wide) s.getBytes(java.nio.charset.StandardCharsets
          .UTF_16LE)
        else s.map(_.toByte).toArray
      val b = new Array[Byte](9 + cb.length)
      Xls.p16(b, 0, rw); Xls.p16(b, 2, col); Xls.p16(b, 4, 15)
      Xls.p16(b, 6, s.length)
      b(8) = (if (wide) 1 else 0).toByte
      System.arraycopy(cb, 0, b, 8 + 1, cb.length)
      Xls.rec(0x0204, b)
    }
    val sheet = Xls.bof(0x0010) ++
      label(0, 0, "plain", wide = false) ++
      label(0, 1, "wid€e", wide = true) ++
      Xls.rec(0x000a, Array.emptyByteArray)
    val globals = Xls.bof(0x0005) ++ {
      val nb = "S".map(_.toByte).toArray
      val b = new Array[Byte](8 + nb.length)
      b(6) = 1
      System.arraycopy(nb, 0, b, 8, nb.length)
      Xls.rec(0x0085, b)
    } ++ Xls.rec(0x000a, Array.emptyByteArray)
    val wb = globals ++ sheet
    Xls.p32(wb, 24, globals.length.toLong) // lbPlyPos
    val bytes = Cfb.cfbWrite(Seq(("Workbook", wb)))
    val doc = Xls.xlsCells(bytes).get
    assert(doc.sheetNames == Seq("S"))
    assert(textOf(doc) == "plainwid€e")
  }

  test("refusals: non-CFB, missing Workbook, BIFF5, encrypted") {
    assert(Xls.xlsCells(null).isEmpty)
    assert(Xls.xlsCells("not a cfb".getBytes).isEmpty)
    // CFB but no Workbook stream
    assert(Xls.xlsCells(Cfb.cfbWrite(Seq(
      ("WordDocument", "x".getBytes)))).isEmpty)
    // BIFF5 version in BOF
    val biff5 = {
      val b = new Array[Byte](16)
      Xls.p16(b, 0, 0x0500); Xls.p16(b, 2, 0x0005)
      Xls.rec(0x0809, b) ++ Xls.rec(0x000a, Array.emptyByteArray)
    }
    assert(Xls.xlsCells(Cfb.cfbWrite(Seq(("Workbook", biff5))))
      .isEmpty)
    // FilePass after BOF -> encrypted -> refuse
    val enc = Xls.bof(0x0005) ++
      Xls.rec(0x002f, new Array[Byte](4)) ++
      Xls.rec(0x000a, Array.emptyByteArray)
    assert(Xls.xlsCells(Cfb.cfbWrite(Seq(("Workbook", enc))))
      .isEmpty)
  }

  test("structural damage refuses: truncation and bad isst") {
    val good = Xls.xlsWrite("some workbook text", 5L)
    assert(Xls.xlsCells(good).isDefined)
    // truncating the container at various points must never throw
    for (n <- Seq(600, 1200, good.length - 64)) {
      val cut = java.util.Arrays.copyOf(good, n)
      assert(Xls.xlsCells(cut).isEmpty ||
        Xls.xlsCells(cut).isDefined) // total, no throw
    }
    // LABELSST pointing past the SST -> refuse
    val sheet = Xls.bof(0x0010) ++ {
      val b = new Array[Byte](10)
      Xls.p32(b, 6, 99L) // isst out of range
      Xls.rec(0x00fd, b)
    } ++ Xls.rec(0x000a, Array.emptyByteArray)
    val globals = Xls.bof(0x0005) ++ {
      val nb = "S".map(_.toByte).toArray
      val b = new Array[Byte](8 + nb.length)
      b(6) = 1
      System.arraycopy(nb, 0, b, 8, nb.length)
      Xls.rec(0x0085, b)
    } ++ Xls.sstWrite(Seq("only one")) ++
      Xls.rec(0x000a, Array.emptyByteArray)
    val wb = globals ++ sheet
    Xls.p32(wb, 24, globals.length.toLong)
    assert(Xls.xlsCells(Cfb.cfbWrite(Seq(("Workbook", wb))))
      .isEmpty)
  }

  test("decoder is total under mutation") {
    val base = Xls.xlsWrite("mutation target text é€", 13L)
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 300) {
      val b = base.clone()
      val n = 1 + rnd.nextInt(4)
      for (_ <- 0 until n)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Xls.xlsCells(b) // must not throw
    }
  }
}
