package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Iceberg

/** Iceberg metadata census: both Avro tiers (manifest list,
  * manifest file) replay their planted closed-form facts through
  * the full nested/union/bytes decode path; damage and non-Avro
  * payloads null-row; both kernels are total under mutation.
  */
class IcebergSpec extends AnyFunSuite {

  test("manifest lists replay planted counts, sequences, spec ids " +
      "and partition summaries") {
    for (id <- 0L to 12L) {
      val r = Iceberg.decodeManifestList(Iceberg.manifestListWrite(id))
      val n = (id % 3 + 1).toInt
      val np = (id % 2 + 1).toInt
      assert(r(0) == n, s"id $id n_manifests")
      assert(r(1) == (0 until n).map(j => (id + j) % 10).sum,
        s"id $id added_files")
      assert(r(2) == 100 * id * n + n * (n - 1) / 2,
        s"id $id added_rows")
      assert(r(3) == (0 until n).map(j => (id + j) % 3).sum,
        s"id $id deleted_files")
      assert(r(4) == id + n - 1 && r(5) == id, s"id $id seq")
      assert(r(6) == (0 until n).map(j => (id + j) % 4)
        .distinct.sorted.mkString(","), s"id $id spec_ids")
      val withParts = (0 until n).filter(_ % 3 != 2)
      assert(r(7) == n - withParts.length, s"id $id null_parts")
      assert(r(8) == withParts.length * np, s"id $id summaries")
      assert(r(9) == withParts.map(j => (0 until np)
        .count(p => (id + j + p) % 2 == 0)).sum, s"id $id has_null")
      assert(r(10) == withParts.map(j => (0 until np)
        .count(p => (id + p) % 3 == 0)).sum, s"id $id miss_upper")
      assert(r(11) == s"s3://lake/meta/snap-$id-m0.avro",
        s"id $id path")
    }
  }

  test("manifest entries replay status histogram, nested data_file " +
      "sums and the int-keyed stats map") {
    for (id <- 0L to 12L) {
      val r = Iceberg.decodeManifest(Iceberg.manifestWrite(id))
      val m = (id % 4 + 1).toInt
      val nc = (id % 3 + 1).toInt
      assert(r(0) == m, s"id $id n_entries")
      assert(r(1) == (0 until m).count(_ % 3 == 0), s"id $id exist")
      assert(r(2) == (0 until m).count(_ % 3 == 1), s"id $id added")
      assert(r(3) == (0 until m).count(_ % 3 == 2), s"id $id del")
      assert(r(4) == (0 until m).count(_ % 4 == 3), s"id $id nsnap")
      assert(r(5) == (0 until m).map(e => 50 * id + e).sum,
        s"id $id rows")
      assert(r(6) == 1024L * m * (m + 1) / 2, s"id $id bytes")
      assert(r(7) == (0 until m).map(e =>
        Seq("PARQUET", "ORC", "AVRO")(((id + e) % 3).toInt))
        .distinct.sorted.mkString(","), s"id $id formats")
      assert(r(8) == (0 until m).map(e => (id + e) % 8).sum,
        s"id $id buckets")
      assert(r(9) == (0 until m).filter(_ % 2 == 0).map(_ =>
        10 * id * nc + nc.toLong * (nc - 1) / 2).sum,
        s"id $id colsizes")
    }
  }

  test("refusals null-row: damage, non-Avro, wrong schema") {
    assert(Iceberg.decodeManifestList(null).head == null)
    assert(Iceberg.decodeManifestList("junk".getBytes).head == null)
    // the OTHER tier's file has the wrong fields — must null, not
    // mis-map
    assert(Iceberg.decodeManifestList(
      Iceberg.manifestWrite(3L)).head == null)
    assert(Iceberg.decodeManifest(
      Iceberg.manifestListWrite(3L)).head == null)
  }

  test("both kernels are total under mutation") {
    val bases = Seq(Iceberg.manifestListWrite(7L),
      Iceberg.manifestWrite(7L))
    val rnd = new scala.util.Random(1713)
    bases.foreach { base =>
      for (_ <- 0 until 250) {
        val b = base.clone()
        for (_ <- 0 until 1 + rnd.nextInt(4))
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        Iceberg.decodeManifestList(b) // must not throw
        Iceberg.decodeManifest(b)
      }
    }
  }

  test("metadata.json census replays planted table-level facts " +
      "(round 18)") {
    for (id <- 0L to 12L) {
      val r = Iceberg.decodeMetadataJson(
        Iceberg.metadataJsonWrite(id))
      val n = (id % 4 + 2).toInt
      val ns = (id % 2 + 1).toInt
      assert(r(0) == 2, s"id $id version")
      assert(r(1) == n, s"id $id n_snapshots")
      assert(r(2) == 1000 * id + n - 1, s"id $id current")
      assert(r(3) == n, s"id $id ancestry") // full linear chain
      assert(r(4) == n, s"id $id log")
      assert(r(5) == true, s"id $id monotonic")
      val ops = Seq("append", "overwrite", "delete", "replace")
      assert(r(6) == (0 until n).map(k => ops(((id + k) % 4).toInt))
        .distinct.sorted.mkString(","), s"id $id ops")
      assert(r(7) == 10 * id * n + n.toLong * (n - 1) / 2,
        s"id $id added_records")
      assert(r(8) == s"s3://lake/meta/snap-${1000 * id + n - 1}.avro",
        s"id $id manifest_list")
      assert(r(9) == ns, s"id $id schemas")
      assert(r(10) == (id % 3).toInt + ns, s"id $id fields")
      assert(r(11) == (id % 3).toInt, s"id $id spec_fields")
      assert(r(12) == n.toLong, s"id $id last_seq")
      assert(r(13) == Seq("parquet", "orc", "avro")((id % 3).toInt),
        s"id $id format")
      assert(r(14) == (0 until n).map(k =>
        1700000000000L + id * 1000 + k * 7).mkString(","),
        s"id $id ts_csv")
      assert(r(15) == (0 until n).map(k => 10 * id + k)
        .mkString(","), s"id $id added_csv")
    }
  }

  test("equality-delete files replay planted key sets (round 18)") {
    for (id <- 0L to 8L) {
      val r = Iceberg.decodeEqDeletes(Iceberg.eqDeleteWrite(id))
      assert(r.head == (0 until 10)
        .filter(_ % 3 == (id % 3).toInt).mkString(","),
        s"id $id keys")
    }
    assert(Iceberg.decodeEqDeletes(null).head == null)
    assert(Iceberg.decodeEqDeletes(
      Iceberg.posDeleteWrite(4L)).head == null)
    val base = Iceberg.eqDeleteWrite(5L)
    val rnd = new scala.util.Random(1816)
    for (_ <- 0 until 200) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Iceberg.decodeEqDeletes(b) // must not throw
    }
  }

  test("metadata.json refusals: broken/cyclic parent chains, " +
      "unknown current snapshot, log naming unknown snapshots, " +
      "duplicate snapshot ids") {
    def doc(s: String) = s.getBytes("UTF-8")
    val base = new String(Iceberg.metadataJsonWrite(3L), "UTF-8")
    // current-snapshot-id not in the snapshot list
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "\"current-snapshot-id\": 3004",
      "\"current-snapshot-id\": 99"))).head == null)
    // a parent naming a snapshot that does not exist
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "\"parent-snapshot-id\": 3000",
      "\"parent-snapshot-id\": 77"))).head == null)
    // a CYCLE in the parent chain (current points at itself)
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "\"parent-snapshot-id\": 3003",
      "\"parent-snapshot-id\": 3004"))).head == null)
    // a log entry naming an unknown snapshot
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "{\"timestamp-ms\": 1700000003000, \"snapshot-id\": 3000}",
      "{\"timestamp-ms\": 1700000003000, \"snapshot-id\": 55}")))
      .head == null)
    // duplicate snapshot ids
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "\"snapshot-id\": 3001,",
      "\"snapshot-id\": 3000,"))).head == null)
    // a format version this reader does not know
    assert(Iceberg.decodeMetadataJson(doc(base.replace(
      "\"format-version\": 2", "\"format-version\": 9")))
      .head == null)
    // non-JSON and null
    assert(Iceberg.decodeMetadataJson(null).head == null)
    assert(Iceberg.decodeMetadataJson(doc("not json")).head == null)
    // a NON-monotonic log surfaces monotonic=false (still censused)
    val swapped = Iceberg.decodeMetadataJson(doc(base.replace(
      "\"timestamp-ms\": 1700000003021,", // log entry for k=3
      "\"timestamp-ms\": 1700000000001,")))
    // the replace also hits snapshot k=3's own timestamp —
    // the doc stays censusable and the out-of-order log is reported
    assert(swapped.head != null)
    assert(swapped(5) == false)
  }

  test("per-manifest (content, seq) pairs surface for the v2 " +
      "sequencing rule (round 18)") {
    for (id <- 0L to 8L) {
      val r = Iceberg.decodeManifestPairs(
        Iceberg.manifestListWrite(id))
      val n = (id % 3 + 1).toInt
      assert(r.head == (0 until n).map(j => s"${j % 2}:${id + j}")
        .mkString(","), s"id $id pairs")
    }
    assert(Iceberg.decodeManifestPairs(null).head == null)
    assert(Iceberg.decodeManifestPairs(
      Iceberg.manifestWrite(3L)).head == null)
  }

  test("position-delete files replay planted (file_path, pos) " +
      "sets; the kernel is total under mutation (round 18)") {
    for (id <- 0L to 12L) {
      val r = Iceberg.decodePosDeletes(Iceberg.posDeleteWrite(id))
      val nf = (id % 4 + 1).toInt
      val want = (for {
        e <- 0 until nf
        p <- 0 until 10
        if p % 3 == ((id + e) % 3).toInt
      } yield s"s3://lake/data/f$id-$e.parquet|$p").mkString(",")
      assert(r.head == want, s"id $id deletes")
    }
    assert(Iceberg.decodePosDeletes(null).head == null)
    assert(Iceberg.decodePosDeletes("junk".getBytes).head == null)
    // the manifest tier's file has the wrong fields — null, not
    // a mis-mapped delete set
    assert(Iceberg.decodePosDeletes(
      Iceberg.manifestWrite(3L)).head == null)
    val base = Iceberg.posDeleteWrite(7L)
    val rnd = new scala.util.Random(1815)
    for (_ <- 0 until 250) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Iceberg.decodePosDeletes(b) // must not throw
    }
  }

  test("metadata.json kernel is total under mutation") {
    val base = Iceberg.metadataJsonWrite(9L)
    val rnd = new scala.util.Random(1813)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Iceberg.decodeMetadataJson(b) // must not throw
    }
  }

  test("refs (round 19): branches/tags resolve to snapshot ids; " +
      "invariants refuse — dangling refs, a non-branch main") {
    val id = 7L // n = 5 snapshots, sids 7000..7004; b1 at 7%5=2
    val r = Iceberg.decodeRefs(Iceberg.metadataJsonWrite(id))
    assert(r == Seq[Any](3, 2, 1, true, 7002L, 7000L,
      "bucket[16]"))
    def doc(refs: String): Array[Byte] =
      (s"""{"format-version": 2, "current-snapshot-id": 10,
         "snapshots": [{"snapshot-id": 10}],
         "partition-specs": [{"spec-id": 0, "fields": []}],
         "refs": $refs}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // minimal well-formed refs
    assert(Iceberg.decodeRefs(doc(
      """{"main": {"snapshot-id": 10, "type": "branch"}}""")) ==
      Seq[Any](1, 1, 0, true, null, null, ""))
    // a ref naming an unknown snapshot refuses
    assert(Iceberg.decodeRefs(doc(
      """{"main": {"snapshot-id": 99, "type": "branch"}}"""))
      .forall(_ == null))
    // main must be a branch
    assert(Iceberg.decodeRefs(doc(
      """{"main": {"snapshot-id": 10, "type": "tag"}}"""))
      .forall(_ == null))
    // a ref without a type refuses
    assert(Iceberg.decodeRefs(doc(
      """{"b": {"snapshot-id": 10}}""")).forall(_ == null))
    assert(Iceberg.decodeRefs(null).forall(_ == null))
    assert(Iceberg.decodeRefs("junk".getBytes("UTF-8"))
      .forall(_ == null))
    // manifest partition tuples surface for the spec application
    val bks = Iceberg.decodeManifestBuckets(
      Iceberg.manifestWrite(id))
    assert(bks == Seq[Any]((0 until (7 % 4 + 1))
      .map(e => (7 + e) % 8).mkString(",")))
  }
}
