package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParquetMeta

/** Parquet split-block bloom filters: the Spark-written fx5 carries
  * blooms on both columns; membership has NO false negatives over
  * all 5000 planted values of each; the absent-probe false-positive
  * census over a fixed 200-probe set is a golden constant of the
  * committed fixture; damage refuses; total.
  */
class PqBloomSpec extends AnyFunSuite {

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/parquet/fx$i.parquet")
    assert(in != null, s"missing fx$i")
    try in.readAllBytes() finally in.close()
  }

  test("fx5 carries blooms + page indexes on both columns") {
    val cols = ParquetMeta.parquetBloomIndex(fixture(5)).get
    assert(cols.map(_.path) == Seq("id", "s"))
    assert(cols.forall(_.bloomOffset.isDefined),
      s"bloom offsets: ${cols.map(c => c.path -> c.bloomOffset)}")
    assert(cols.forall(_.hasColumnIndex))
    assert(cols.forall(_.hasOffsetIndex))
    // fx0 (written without bloom options) has none
    val plain = ParquetMeta.parquetBloomIndex(fixture(0)).get
    assert(plain.forall(_.bloomOffset.isEmpty))
  }

  test("membership: no false negatives over all 5000 values of " +
      "both columns; absent-probe FP census is the fixture golden") {
    val b = fixture(5)
    val cols = ParquetMeta.parquetBloomIndex(b).get
    val idBloom = ParquetMeta.readBloom(b,
      cols.find(_.path == "id").get.bloomOffset.get).get
    val sBloom = ParquetMeta.readBloom(b,
      cols.find(_.path == "s").get.bloomOffset.get).get
    assert(idBloom.algo == "block" && idBloom.hash == "xxhash" &&
      idBloom.compression == "uncompressed")
    assert(idBloom.nBytes % 32 == 0 && idBloom.nBytes > 0)
    // every planted value MUST hit (bloom contract)
    (0L until 5000L).foreach { v =>
      assert(ParquetMeta.bloomCheck(idBloom.bits,
        ParquetMeta.bloomHashLong(v)), s"id $v missed")
      assert(ParquetMeta.bloomCheck(sBloom.bits,
        ParquetMeta.bloomHashBytes(s"v$v".getBytes("UTF-8"))),
        s"s v$v missed")
    }
    // absent probes: deterministic census over a fixed set
    val idFp = (5000L until 5200L).count(v =>
      ParquetMeta.bloomCheck(idBloom.bits,
        ParquetMeta.bloomHashLong(v)))
    val sFp = (5000L until 5200L).count(v =>
      ParquetMeta.bloomCheck(sBloom.bits,
        ParquetMeta.bloomHashBytes(s"v$v".getBytes("UTF-8"))))
    // the committed fixture's goldens (also baked into the
    // q_parquet_bloom oracle): 8192-byte filters, zero false
    // positives over this probe set
    assert(idBloom.nBytes == 8192 && sBloom.nBytes == 8192)
    assert(idFp == 0 && sFp == 0, s"fp census $idFp/$sFp")
  }

  test("damage refuses: lying offsets, truncated bitsets, total " +
      "under mutation") {
    val b = fixture(5)
    assert(ParquetMeta.readBloom(b, -1).isEmpty)
    assert(ParquetMeta.readBloom(b, b.length - 2).isEmpty)
    assert(ParquetMeta.readBloom(null, 0).isEmpty)
    assert(ParquetMeta.parquetBloomIndex("PAR1junk".getBytes).isEmpty)
    val rnd = new scala.util.Random(517)
    for (_ <- 0 until 150) {
      val m = b.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      ParquetMeta.parquetBloomIndex(m).foreach(_.foreach(c =>
        c.bloomOffset.foreach(o => ParquetMeta.readBloom(m, o))))
    }
  }
}
