package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.operators.{BandIndex, Dedup}

class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")
  private def corpus = docs.filter(col("doc_id") % 5 =!= 0)
  private def batch  = docs.filter(col("doc_id") % 5 === 0)

  private def touchesBatch(pairs: DataFrame) = pairs
    .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)

  private def asSet(df: DataFrame) = df
    .select("id_a", "id_b", "est_jaccard")
    .as[(Long, Long, Double)].collect().toSet

  private def withIndex(t: String)(body: => Unit): Unit =
    try body
    finally Seq(t, s"${t}_stats", s"${t}_meta").foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
    }

  test("increment equals full recompute restricted to batch pairs") {
    val t = "band_spec_idx"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      val inc  = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text"))
      val full = asSet(touchesBatch(
        Dedup.minhashDupPairs(docs, "doc_id", "text")))
      assert(inc == full && inc.nonEmpty)
    }
  }

  test("combined maxBucket cap binds exactly as in the recompute") {
    val t = "band_spec_cap"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      // a cap small enough to actually drop buckets on this corpus
      val inc = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text", maxBucket = 3L))
      val full = asSet(touchesBatch(
        Dedup.minhashDupPairs(docs, "doc_id", "text", maxBucket = 3L)))
      assert(inc == full)
      // and the cap actually bound somewhere (else the test is vacuous)
      val uncapped = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text"))
      assert(inc != uncapped)
    }
  }

  test("signature params come from the meta table, not the caller") {
    val t = "band_spec_meta"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t, k = 8, bands = 2)
      val inc  = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text"))
      val full = asSet(touchesBatch(
        Dedup.minhashDupPairs(docs, "doc_id", "text", k = 8, bands = 2)))
      assert(inc == full && inc.nonEmpty)
    }
  }

  test("disabling the literal probe changes nothing but the plan") {
    val t = "band_spec_noprobe"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      val pruned = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text"))
      val plain  = asSet(BandIndex.neardupIncrement(spark, t, batch,
        "doc_id", "text", pruneKeyLimit = 0))
      assert(pruned == plain)
    }
  }

  /** Walk down from the root: the target table's scan must meet a JOIN
    * before it meets any shuffle — i.e. index rows sort-merge in place
    * (bucketed scan) and only joined pair rows ever shuffle.
    */
  private def scanJoinsBeforeShuffle(p: SparkPlan, table: String)
      : Boolean = {
    sealed trait St
    case object NoScan extends St
    case object Open   extends St // scan below, no join/shuffle yet
    case object Ok     extends St
    case object Bad    extends St
    def visit(n: SparkPlan): St = {
      val below = n.children.map(visit)
      if (below.contains(Bad)) Bad
      else if (below.contains(Ok)) Ok
      else if (below.contains(Open)) n match {
        case _: ShuffleExchangeLike => Bad
        case _: BaseJoinExec        => Ok
        case _                      => Open
      }
      else n match {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == table) => Open
        case _ => NoScan
      }
    }
    visit(p) == Ok
  }

  test("index side of the candidate join never shuffles, and a small " +
      "batch prunes buckets at the scan") {
    val t = "band_spec_plan"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      val prev = (spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = BandIndex.neardupIncrement(spark, t, batch,
          "doc_id", "text")
        val plan = df.queryExecution.executedPlan
        assert(scanJoinsBeforeShuffle(plan, t),
          s"index scan shuffles before joining:\n$plan")
        assert(plan.toString.contains("SelectedBucketsCount"),
          s"no bucket pruning in:\n$plan")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", prev._1)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._2)
      }
    }
  }
}
