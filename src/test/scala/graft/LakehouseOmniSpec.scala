package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Iceberg, LakehouseOmni, Orc, ParquetMeta,
  DeltaLog}

/** Lakehouse omni dispatch: each metadata kind routes to its
  * decoder and replays a planted fact; the two Avro tiers are told
  * apart by schema; non-metadata payloads and damage null-row; the
  * dispatch is total under mutation of every kind.
  */
class LakehouseOmniSpec extends AnyFunSuite {

  test("each kind routes and replays its planted fact") {
    // delta (id ≡ 0 mod 5): provider + add-bytes sum
    val id0 = 10L
    val delta = DeltaLog.deltaWrite(
      (0 until (id0 % 4 + 1).toInt).map(i => 100 * id0 + i),
      (id0 % 3).toInt, Seq("dt"))
      .getBytes("UTF-8")
    val r0 = LakehouseOmni.decodeLakehouse(delta)
    assert(r0(0) == "application/x-delta-log" && r0(1) == "parquet")
    val a = (id0 % 4 + 1).toInt
    assert(r0(2) == a * 100 * id0 + a.toLong * (a - 1) / 2)
    // iceberg manifest list vs manifest: schema-discriminated
    val r1 = LakehouseOmni.decodeLakehouse(
      Iceberg.manifestListWrite(6L))
    assert(r1(0) == "application/x-iceberg-manifest-list")
    val r2 = LakehouseOmni.decodeLakehouse(Iceberg.manifestWrite(6L))
    assert(r2(0) == "application/x-iceberg-manifest")
    val m = (6L % 4 + 1).toInt
    assert(r2(2) == 50 * 6L * m + m.toLong * (m - 1) / 2)
    // parquet + orc footers
    val r3 = LakehouseOmni.decodeLakehouse(ParquetMeta.Fixtures(1))
    assert(r3(0) == "application/vnd.apache.parquet" &&
      r3(1) == "snappy" && r3(2) == 250L)
    val r4 = LakehouseOmni.decodeLakehouse(Orc.Fixtures(3))
    assert(r4(0) == "application/x-orc" && r4(1) == "zstd" &&
      r4(2) == 20000L)
    // round 18: table-level metadata.json routes BEFORE the delta
    // branch (both are text/plain)
    val r5 = LakehouseOmni.decodeLakehouse(
      Iceberg.metadataJsonWrite(5L))
    assert(r5(0) == "application/x-iceberg-metadata")
    assert(r5(1) == "avro") // format_default for id 5 (5 % 3 == 2)
    assert(r5(2) == 1000 * 5L + (5 % 4) + 1) // current snapshot id
    // the DV blob routes off octet-stream via the CRC-framed parse
    val r6 = LakehouseOmni.decodeLakehouse(
      graft.operators.DeletionVectors.dvWrite(6L))
    assert(r6(0) == "application/x-delta-dv" && r6(1) == "maps=1")
    assert(r6(2) == 14L + 100L + 32768L) // id 6: r7=6→14, even
    // the position-delete payload is a THIRD Avro schema
    val r7 = LakehouseOmni.decodeLakehouse(
      Iceberg.posDeleteWrite(7L))
    assert(r7(0) == "application/x-iceberg-pos-delete")
    assert(r7(2) == (0 until 4).map(e =>
      (0 until 10).count(_ % 3 == ((7 + e) % 3))).sum.toLong)
  }

  test("non-metadata payloads null-row, never guess") {
    // plain JSON that is NOT a one-action-per-line commit log
    assert(LakehouseOmni.decodeLakehouse(
      """{"a": 1, "b": 2}""".getBytes("UTF-8")).head == null)
    // plain prose
    assert(LakehouseOmni.decodeLakehouse(
      "just some text\n".getBytes("UTF-8")).head == null)
    // an Avro file that is neither Iceberg tier (the named-type
    // fixture from AvroSpec's surface)
    assert(LakehouseOmni.decodeLakehouse(
      graft.operators.Avro.avroWriteNamed(4L)).head == null)
    assert(LakehouseOmni.decodeLakehouse(null).head == null)
    assert(LakehouseOmni.decodeLakehouse(Array[Byte]()).head == null)
  }

  test("dispatch is total under mutation of every kind") {
    val bases = Seq(
      DeltaLog.deltaWrite(Seq(100L, 200L), 1, Seq("dt"))
        .getBytes("UTF-8"),
      Iceberg.manifestListWrite(7L), Iceberg.manifestWrite(7L),
      ParquetMeta.Fixtures(2), Orc.Fixtures(2),
      Iceberg.metadataJsonWrite(7L),
      graft.operators.DeletionVectors.dvWrite(7L),
      Iceberg.posDeleteWrite(7L))
    val rnd = new scala.util.Random(1717)
    bases.foreach { base =>
      for (_ <- 0 until 120) {
        val b = base.clone()
        for (_ <- 0 until 1 + rnd.nextInt(4))
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        LakehouseOmni.decodeLakehouse(b) // must not throw
      }
    }
  }
}
