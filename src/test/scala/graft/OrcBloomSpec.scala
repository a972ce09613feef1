package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Orc

/** ORC row-group index + bloom streams (round 18), pinned against
  * the committed Spark-written fixture fx6 (5000 rows, one stripe,
  * stride 1000, blooms on both columns):
  *  - the index parse recovers the exact per-group zone maps;
  *  - EVERY member value hits its own group's bloom on both
  *    columns (10,000 probes — blooms have no false negatives, so
  *    one wrong bit anywhere in the hash or probe math fails);
  *  - the per-group absent windows are zero-FP (what makes the
  *    oracle's FALSE verdicts deterministic);
  *  - the long hash uses SIGNED shifts (0 → 0, the corner where
  *    the unsigned Thomas-Wang variant diverges — found against
  *    the classpath writer's own bytecode);
  *  - refusals: multi-stripe files, bloom-less files, damage.
  */
class OrcBloomSpec extends AnyFunSuite {

  private lazy val ix = Orc.orcIndexInfo(Orc.BloomFixture).get

  test("index parse: 5 exact 1000-row groups, k=7, 1200-byte " +
      "bitsets on both columns") {
    assert(ix.riMins == Vector(0L, 1000L, 2000L, 3000L, 4000L))
    assert(ix.riMaxs == Vector(999L, 1999L, 2999L, 3999L, 4999L))
    assert(ix.idBlooms.length == 5 && ix.sBlooms.length == 5)
    assert(ix.idBlooms.forall(g => g.k == 7 &&
      g.bits.length == 1200))
    assert(ix.sBlooms.forall(g => g.k == 7 &&
      g.bits.length == 1200))
  }

  test("every member value hits its own group's bloom on both " +
      "columns (no false negatives)") {
    for (v <- 0L until 5000L) {
      val g = (v / 1000L).toInt
      assert(Orc.orcBloomTest(ix.idBlooms(g), Orc.wangHash64(v)),
        s"long member $v")
      assert(Orc.orcBloomTest(ix.sBlooms(g), Orc.murmur3Hash64(
        s"v$v".getBytes("UTF-8"))), s"string member v$v")
    }
  }

  test("the pinned absent windows are zero-FP against their own " +
      "group (both columns)") {
    for (g <- 0 until 5; off <- 0L until 200L) {
      val v = Orc.BloomAbsentBase(g) + off
      assert(!Orc.orcBloomTest(ix.idBlooms(g), Orc.wangHash64(v)),
        s"long absent $v group $g")
      assert(!Orc.orcBloomTest(ix.sBlooms(g), Orc.murmur3Hash64(
        s"v$v".getBytes("UTF-8"))), s"string absent v$v group $g")
    }
  }

  test("the long hash is the SIGNED-shift Thomas-Wang mix: 0 " +
      "maps to 0 (the writer's own corner case)") {
    assert(Orc.wangHash64(0L) == 0L)
    // and 0 really is findable in the fixture through that hash
    assert(Orc.orcBloomTest(ix.idBlooms(0), Orc.wangHash64(0L)))
    // spot values stay stable (regression pin for the mix)
    assert(Orc.wangHash64(1L) != Orc.wangHash64(-1L))
    assert(Orc.wangHash64(4999L) != 0L)
  }

  test("refusals: multi-stripe files, bloom-less files, damage") {
    // fx5 (the stats fixture) is multi-stripe → refuse, don't
    // census one stripe of many
    assert(Orc.orcIndexInfo(Orc.StatsFixture).isEmpty)
    // fx0 is single-stripe but carries no bloom streams
    assert(Orc.orcIndexInfo(Orc.Fixtures(0)).isEmpty)
    assert(Orc.orcIndexInfo(null).isEmpty)
    assert(Orc.orcIndexInfo("junk".getBytes).isEmpty)
  }

  test("the index parse is total under mutation") {
    val base = Orc.BloomFixture
    val rnd = new scala.util.Random(1806)
    for (_ <- 0 until 150) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Orc.orcIndexInfo(b) // must not throw
    }
  }
}
