package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParquetMeta

/** Parquet PAGE-level column indexes (round 18), pinned against
  * the committed parquet-mr fixture fx6 (5000 sorted rows forced
  * into exact 1000-row pages): the ColumnIndex bounds decode to
  * the planted page ranges, the OffsetIndex first-row list is
  * exact, boundary orders carry the writer's own semantics (the
  * sorted long column is ASCENDING; the string column is
  * UNORDERED because "v999" > "v1000" lexicographically — a
  * subtlety a naive implementation would get wrong), and the
  * parse refuses index-less files and damage.
  */
class PqPageIndexSpec extends AnyFunSuite {

  private def le(a: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (a(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  test("page bounds and first-row indexes replay the planted " +
      "1000-row pages") {
    val cols = ParquetMeta.parquetPageIndex(
      ParquetMeta.PageFixture).get
    val id = cols.find(_.path == "id").get
    assert(id.minBytes.map(le) ==
      Vector(0L, 1000L, 2000L, 3000L, 4000L))
    assert(id.maxBytes.map(le) ==
      Vector(999L, 1999L, 2999L, 3999L, 4999L))
    assert(id.firstRows == Vector(0L, 1000L, 2000L, 3000L, 4000L))
    assert(id.boundaryOrder == 1) // ASCENDING
    assert(id.nullPages.forall(!_))
    val s = cols.find(_.path == "s").get
    assert(new String(s.minBytes.head, "UTF-8") == "v0")
    assert(new String(s.maxBytes.last, "UTF-8") == "v4999")
    // lexicographic page bounds are NOT monotonic across pages
    // ("v1999" < "v999"), so the writer marks the column UNORDERED
    assert(s.boundaryOrder == 0)
    assert(s.firstRows == id.firstRows)
  }

  test("refusals: files without page indexes, damage, junk") {
    // fx0 (parquet-mr too) predates... no: it has indexes — the
    // bloom fixture carries them as well; a NON-parquet payload
    // and truncation must refuse
    assert(ParquetMeta.parquetPageIndex(null).isEmpty)
    assert(ParquetMeta.parquetPageIndex("junk".getBytes).isEmpty)
    assert(ParquetMeta.parquetPageIndex(
      ParquetMeta.PageFixture.take(100)).isEmpty)
  }

  test("the parse is total under mutation") {
    val base = ParquetMeta.PageFixture
    val rnd = new scala.util.Random(1819)
    for (_ <- 0 until 150) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ParquetMeta.parquetPageIndex(b) // must not throw
    }
  }
}
