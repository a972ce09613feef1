package graft

import graft.operators.Maintenance

/** Maintenance planning: next-fit bin assignment matches the
  * hand-computed packing (including the cross-boundary file rule
  * and per-partition independence); the orphan sweep keeps exactly
  * the unreferenced paths and drops fully-referenced owners.
  */
class MaintenanceSpec extends SparkSpec {

  test("compactionPlan: next-fit by exclusive-prefix bytes, " +
      "independent per partition") {
    import spark.implicits._
    val files = Seq(
      ("a", 600L, 1L), ("a", 600L, 2L), ("a", 600L, 3L),
      ("b", 100L, 1L))
      .toDF("part", "size", "ord")
    val plan = Maintenance.compactionPlan(files, "part", "size",
        "ord", target = 1024L)
      .orderBy("part", "bin").collect()
    // a: prefixes 0/600/1200 -> bins 0,0,1
    assert(plan.length == 3)
    assert(plan(0).getString(0) == "a" && plan(0).getLong(1) == 0 &&
      plan(0).getInt(2) == 2 && plan(0).getLong(3) == 1200 &&
      !plan(0).getBoolean(4))
    assert(plan(1).getString(0) == "a" && plan(1).getLong(1) == 1 &&
      plan(1).getInt(2) == 1 && plan(1).getLong(3) == 600 &&
      !plan(1).getBoolean(4)) // 600 >= target/2
    assert(plan(2).getString(0) == "b" && plan(2).getLong(1) == 0 &&
      plan(2).getInt(2) == 1 && plan(2).getLong(3) == 100 &&
      plan(2).getBoolean(4)) // undersized tail
  }

  test("orphanFiles: anti join keeps exactly the unreferenced; " +
      "fully-referenced owners vanish") {
    import spark.implicits._
    val listing = Seq(
      (1L, "f1-0", 10L), (1L, "f1-1", 11L), (1L, "f1-2", 12L),
      (2L, "f2-0", 20L))
      .toDF("owner", "path", "size")
    val referenced = Seq("f1-0", "f2-0").toDF("ref_path")
    val got = Maintenance.orphanFiles(listing, "path", "size",
        "owner", referenced, "ref_path")
      .orderBy("owner").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getInt(1) == 2 &&
      got(0).getLong(2) == 23L)
  }
}
