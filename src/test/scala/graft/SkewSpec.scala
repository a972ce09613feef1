package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 900 of 1000 rows share key 7
  private val fact = ((1 to 900).map(_ => (7, "x")) ++
    (1 to 100).map(i => (i % 5, "y"))).toDF("k", "payload")
  private val dim = Seq((7, "hot"), (0, "a"), (1, "b"), (2, "c"),
    (3, "d"), (4, "e")).toDF("k", "label")

  test("saltedJoin is row-identical to the plain join") {
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "label").count()
      .as[(Int, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 8)
      .groupBy("k", "label").count()
      .as[(Int, String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedAgg merges partials to the exact plain aggregate") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n")).as[(Int, Long)].collect().toSet
    val salted = Skew.saltedAgg(fact, Seq("k"), salt = 8,
      partials = Seq((count(lit(1)), "n_part")),
      merges = Seq(((c: org.apache.spark.sql.Column) => sum(c), "n")))
      .as[(Int, Long)].collect().toSet
    assert(salted == plain)
  }

  test("keyProfile: heavy keys first with exact milli shares, null " +
      "keys counted, deterministic tie order, top-k cut") {
    import spark.implicits._
    val rows = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      Seq.fill(20)(null.asInstanceOf[String]) ++
      Seq("c1", "c2", "c3") // three singleton ties
    val df = rows.toDF("k")
    val prof = Skew.keyProfile(df, Seq("k"), k = 4)
      .as[(String, Long, Long)].collect()
    assert(prof.length == 4)
    assert(prof(0) == (("hot", 60L, 60L * 1000 / rows.length)))
    // 20-count tie: "warm" vs null — nulls sort LAST in the tie
    // (SQL engines' ASC default, so the cut replays identically)
    assert(prof(1)._2 == 20L && prof(2)._2 == 20L)
    assert(prof(1)._1 == "warm" && prof(2)._1 == null)
    // the 4th slot is the lexicographically first singleton
    assert(prof(3) == (("c1", 1L, 1000L / rows.length)))
  }
}
