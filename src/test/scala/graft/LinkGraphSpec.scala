package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent exact-integer PageRank reference (map-based). */
  private def ref(edges: Seq[(String, String)],
      iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val c = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((u, v) <- e) c(v) += r(u) / od(u)
      r = nodes.map(n => n -> (150000L + 85L * c(n) / 100L)).toMap
    }
    r
  }

  private val g = Seq("A" -> "B", "A" -> "C", "B" -> "C", "C" -> "A",
    "B" -> "D") // D: dangling (receives, never emits)

  test("pageRank matches the map reference incl. dangling + dup edges") {
    // a duplicated input edge must NOT double its contribution
    val in = (g :+ ("A" -> "B")).toDF("s", "d")
    val got = LinkGraph.pageRank(in, "s", "d", iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(got == ref(g, 5))
    // D ends above base (it has an in-edge), A's rank flowed from C
    assert(got("D") > 150000L && got.values.forall(_ >= 150000L))
  }

  test("pageRank: zero iterations = uniform unit mass; invariant under repartitioning") {
    val in = g.toDF("s", "d")
    val r0 = LinkGraph.pageRank(in, "s", "d", iterations = 0)
      .as[(String, Long)].collect().toMap
    assert(r0.values.toSet == Set(1000000L) && r0.size == 4)
    val skewed = LinkGraph.pageRank(in.repartition(7), "s", "d",
      iterations = 5).as[(String, Long)].collect().toMap
    assert(skewed == ref(g, 5))
  }

  test("domainEdges: extraction, dedup, self-link drop") {
    val df = Seq(("a.com",
      "see http://b.com/x https://a.com/self http://c.net/y " +
        "http://b.com/z")).toDF("source", "text")
    val e = LinkGraph.domainEdges(df, "source", "text")
      .as[(String, String)].collect().toSet
    assert(e == Set("a.com" -> "b.com", "a.com" -> "c.net"))
  }

  test("trustRank: mass reaches only seed-reachable nodes; " +
      "closeness to the seed orders ranks") {
    // chain s -> a -> b, plus an island x -> y the seed cannot reach
    val edges = Seq(("s", "a"), ("a", "b"), ("x", "y"))
      .toDF("src", "dst")
    val r = LinkGraph.trustRank(edges, "src", "dst", Seq("s"),
        iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(r("x") == 0L && r("y") == 0L) // unreachable: exactly 0
    assert(r("s") > r("a") && r("a") > r("b") && r("b") > 0L)
  }

  test("trustRank is partition-invariant and matches an independent " +
      "integer reference on a small graph") {
    val edges = Seq(("s", "a"), ("s", "b"), ("a", "b"), ("b", "s"))
      .toDF("src", "dst")
    def run(parts: Int) =
      LinkGraph.trustRank(edges.repartition(parts), "src", "dst",
        Seq("s"), iterations = 3)
        .as[(String, Long)].collect().toMap
    val got = run(1)
    assert(got == run(5))
    // reference: same recurrence in a Map fold
    val out = Map("s" -> Seq("a", "b"), "a" -> Seq("b"),
      "b" -> Seq("s"))
    var rk = Map("s" -> 1000000L, "a" -> 0L, "b" -> 0L)
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      for ((u, vs) <- out; v <- vs)
        contrib(v) += rk(u) / vs.length
      rk = rk.keys.map { v =>
        v -> ((if (v == "s") 150000L else 0L) +
          85L * contrib(v) / 100L)
      }.toMap
    }
    assert(got == rk)
  }

  test("weakComponents: direction ignored, islands stay separate, " +
      "label = smallest node") {
    val edges = Seq(
      ("b.com", "a.com"),   // direction reversed: still one component
      ("b.com", "c.net"),
      ("x.org", "y.org")    // second island
    ).toDF("src", "dst")
    val out = LinkGraph.weakComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(out == Map("a.com" -> "a.com", "b.com" -> "a.com",
      "c.net" -> "a.com", "x.org" -> "x.org", "y.org" -> "x.org"))
  }

  test("weakComponents is partitioning-invariant and handles " +
      "duplicate edges") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("c", "d"))
      .toDF("src", "dst")
    def run(parts: Int) =
      LinkGraph.weakComponents(edges.repartition(parts), "src", "dst")
        .as[(String, String)].collect().toMap
    assert(run(1) == run(5))
    assert(run(1) == Map("a" -> "a", "b" -> "a", "c" -> "c",
      "d" -> "c"))
  }
}
