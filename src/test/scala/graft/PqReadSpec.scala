package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParquetMeta

/** Parquet DATA-PAGE decode (round 18) — real values out of real
  * parquet-mr files with house code end-to-end: page headers,
  * every fixture codec (uncompressed, snappy, gzip, zstd,
  * Hadoop-framed lz4), PLAIN and the dictionary + RLE/bit-packed
  * hybrid. Every fixture's planted column replays exactly, and
  * refusals (unknown codec lies via mutation, nullable columns,
  * truncation) stay total.
  */
class PqReadSpec extends AnyFunSuite {

  test("the id column decodes exactly across all five codecs") {
    // (fixture, expected n in row group 0) — planted ids are
    // 0..n-1, so sum and identity are closed-form
    val cases = Seq(
      (ParquetMeta.Fixtures(0), 100), // uncompressed
      (ParquetMeta.Fixtures(1), 250), // snappy
      (ParquetMeta.Fixtures(2), 50), // gzip
      (ParquetMeta.Fixtures(3), 144), // zstd (row group 0 of many)
      (ParquetMeta.Fixtures(4), 300), // lz4 (Hadoop framing)
      (ParquetMeta.PageFixture, 5000)) // snappy, 5 pages
    cases.foreach { case (fx, n) =>
      val c = ParquetMeta.readLongColumn(fx, "id").get
      assert(c.values.length == n)
      assert(c.values.zipWithIndex.forall { case (v, i) => v == i },
        s"ids 0..${n - 1} must decode identically")
    }
  }

  test("the low-cardinality column exercises the dictionary + " +
      "RLE/bit-packed hybrid path") {
    val g = ParquetMeta.readLongColumn(
      ParquetMeta.Fixtures(4), "grp").get
    assert(g.nDictEntries == 7) // grp = i % 7 over 300 rows
    assert(g.values.length == 300)
    assert(g.values.zipWithIndex.forall { case (v, i) => v == i % 7 })
  }

  test("string columns decode with definition levels: nulls, the " +
      "string dictionary, and PLAIN byte arrays") {
    // fx7: every 7th tag NULL, 5 distinct values → dictionary
    val t = ParquetMeta.readStringColumn(
      ParquetMeta.NullableFixture, "tag").get
    assert(t.values.length == 400 && t.nNulls == 58 &&
      t.nDictEntries == 5)
    assert(t.values.zipWithIndex.forall { case (v, i) =>
      if (i % 7 == 0) v == null else v == s"t${i % 5}" })
    // fx6.s: 5000 all-defined PLAIN strings across 5 pages
    val s = ParquetMeta.readStringColumn(
      ParquetMeta.PageFixture, "s").get
    assert(s.nNulls == 0 &&
      s.values.zipWithIndex.forall { case (v, i) => v == s"v$i" })
    // fx0.name: PLAIN, uncompressed
    val n = ParquetMeta.readStringColumn(
      ParquetMeta.Fixtures(0), "name").get
    assert(n.values.zipWithIndex.forall { case (v, i) =>
      v == s"name-$i" })
  }

  test("refusals: unknown columns, non-parquet, truncation; " +
      "totality under mutation") {
    assert(ParquetMeta.readLongColumn(
      ParquetMeta.PageFixture, "nope").isEmpty)
    assert(ParquetMeta.readLongColumn(null, "id").isEmpty)
    assert(ParquetMeta.readLongColumn("junk".getBytes, "id").isEmpty)
    assert(ParquetMeta.readLongColumn(
      ParquetMeta.PageFixture.take(500), "id").isEmpty)
    val base = ParquetMeta.Fixtures(0)
    val rnd = new scala.util.Random(1823)
    for (_ <- 0 until 200) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ParquetMeta.readLongColumn(b, "id") // must not throw
      ParquetMeta.readStringColumn(b, "name")
    }
    val base7 = ParquetMeta.NullableFixture
    for (_ <- 0 until 200) {
      val b = base7.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ParquetMeta.readStringColumn(b, "tag") // must not throw
    }
  }
}
