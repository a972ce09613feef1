package graft

import java.nio.file.{Files, Paths}

import graft.operators.TableScan

/** The end-to-end table reads and their seams: the stale-snapshot
  * pointer, the v2 sequence gate, the DV probe, and the plan shape
  * (broadcast anti join, no sort-merge in the MOR path).
  */
class TableScanSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString + "/t"

  test("iceberg end-to-end: metadata -> manifests -> typed pages " +
      "-> gated deletes replays the planted live set exactly") {
    val dir = tmp("graft_icescan")
    TableScan.plantIcebergTable(spark, dir)
    val got = TableScan.icebergScan(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def expected(k: Int): (Long, Long) = {
      val deleted = (0 until 200).filter { j =>
        (k <= 3 && j % 10 == 0) ||
          (Set(0, 4, 5)(k) && j % 9 == 0)
      }.toSet
      val live = (0 until 200).filterNot(deleted)
      (live.size.toLong, live.map(j => 3L * (1000L * k + j)).sum)
    }
    assert(got.keySet == (0 to 5).toSet)
    (0 to 5).foreach(k => assert(got(k) == expected(k), s"file $k"))
    // THE gate seam: f4 (data seq 4) must ignore pd0 (seq 3) —
    // 23 j%9 deletes, NOT 20 more from j%10
    assert(got(4)._1 == 177L)
    // f1..f3: only pd0 applies
    assert(got(1)._1 == 180L && got(3)._1 == 180L)
  }

  test("iceberg seam: the STALE snapshot's manifest list is never " +
      "read — flipping current-snapshot-id changes the scan") {
    val dir = tmp("graft_icestale")
    TableScan.plantIcebergTable(spark, dir)
    val mj = Paths.get(dir, "metadata", "v3.metadata.json")
    val patched = Files.readString(mj)
      .replace("\"current-snapshot-id\": 99",
        "\"current-snapshot-id\": 98")
    Files.writeString(mj, patched)
    val got = TableScan.icebergScan(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // snapshot 98's list names only m0 (f0..f2) and NO deletes
    assert(got.keySet == Set(0, 1, 2))
    assert(got.values.toSet == Set(200L))
  }

  test("delta end-to-end: checkpoint + DV tail replays the " +
      "planted live set; the removed file never appears") {
    val dir = tmp("graft_deltascan")
    TableScan.plantDeltaTable(spark, dir)
    val got = TableScan.deltaScan(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == Set(0, 2, 3)) // part-1 removed at v2
    assert(got(0)._1 == 225L) // 25 j%10 positions DV-deleted
    assert(got(2)._1 == 214L) // 36 j%7 positions DV-deleted
    assert(got(3)._1 == 250L) // no DV
    def sumVal(k: Int, dead: Int => Boolean): Long =
      (0 until 250).filterNot(dead)
        .map(j => 2L * (1000L * k + j) + 1).sum
    assert(got(0)._2 == sumVal(0, _ % 10 == 0))
    assert(got(2)._2 == sumVal(2, _ % 7 == 0))
    assert(got(3)._2 == sumVal(3, _ => false))
  }

  test("plan shape: the iceberg MOR anti join broadcasts, nothing " +
      "sort-merges, and one shuffle feeds the final aggregate") {
    val dir = tmp("graft_iceplan")
    TableScan.plantIcebergTable(spark, dir)
    val plan = TableScan.icebergScan(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("column mapping (name mode): physical parquet names " +
      "resolve from schemaString; the census equals the unmapped " +
      "twin's") {
    val mapped = tmp("graft_cmname")
    val twin = tmp("graft_cmplain")
    TableScan.plantDeltaMappedTable(spark, mapped, "name")
    TableScan.plantDeltaMappedTable(spark, twin, "plain")
    def scan(d: String) = TableScan.deltaScan(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val m = scan(mapped)
    val t = scan(twin)
    assert(m == t)
    assert(m(1) == ((150L,
      (0 until 150).map(j => 5L * (1000 + j) + 2).sum)))
    // the files really carry physical names — reading the logical
    // name directly refuses
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mapped, "part-0.parquet"))
    assert(graft.operators.ParquetTyped
      .readTypedColumn(bytes, "id").isEmpty)
    assert(graft.operators.ParquetTyped
      .readTypedColumn(bytes, "col-9f8a1b2c").isDefined)
  }

  test("column mapping (id mode): columns resolve by parquet " +
      "field id, not by any name") {
    val dir = tmp("graft_cmid")
    TableScan.plantDeltaMappedTable(spark, dir, "id")
    val got = TableScan.deltaScan(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == Set(0, 1, 2))
    assert(got(2) == ((150L,
      (0 until 150).map(j => 5L * (2000 + j) + 2).sum)))
    // the parquet footer really carries the field ids
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-0.parquet"))
    assert(graft.operators.ParquetTyped
      .leafNameByFieldId(bytes, 101).contains("pc1"))
    assert(graft.operators.ParquetTyped
      .leafNameByFieldId(bytes, 102).contains("pc2"))
    assert(graft.operators.ParquetTyped
      .leafNameByFieldId(bytes, 999).isEmpty)
  }

  test("actionWithDv: the descriptor kernel maps adds with and " +
      "without DVs, path storage only; junk refuses") {
    assert(TableScan.actionWithDv(
      """{"add":{"path":"p.parquet","size":1,"dataChange":true,""" +
      """"deletionVector":{"storageType":"p","pathOrInlineDv":""" +
      """"/x/dv.bin","offset":0,"sizeInBytes":0,"cardinality":2}}}""")
      .contains(("add", "p.parquet", "/x/dv.bin")))
    assert(TableScan.actionWithDv(
      """{"add":{"path":"p.parquet","size":1}}""")
      .contains(("add", "p.parquet", "")))
    // inline DVs are not path storage: descriptor ignored (the
    // scan would treat the file as DV-less rather than misread)
    assert(TableScan.actionWithDv(
      """{"add":{"path":"p","deletionVector":{"storageType":"i",""" +
      """"pathOrInlineDv":"abc"}}}""")
      .contains(("add", "p", "")))
    assert(TableScan.actionWithDv(
      """{"remove":{"path":"p.parquet"}}""")
      .contains(("remove", "p.parquet", "")))
    assert(TableScan.actionWithDv("junk").isEmpty)
    assert(TableScan.actionWithDv("[1]").isEmpty)
  }
}
