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

  test("append extends the index: increments see appended docs and " +
      "the summed stats keep the cap exact") {
    val t = "band_spec_append"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      val before = spark.table(t).count()
      BandIndex.append(spark, t, batch, "doc_id", "text")
      assert(spark.table(t).count() > before)
      // after appending the batch, an increment of the SAME docs (new
      // ids) must pair them against the appended copies
      val again = batch.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"))
      val inc = asSet(BandIndex.neardupIncrement(spark, t, again,
        "doc_id", "text"))
      val expected = asSet(touchesBatch(Dedup.minhashDupPairs(
        docs.unionByName(again), "doc_id", "text"))
        .filter(col("id_a") >= 1000000L || col("id_b") >= 1000000L))
      assert(inc.filter(p => p._1 >= 1000000L || p._2 >= 1000000L)
        == expected)
      assert(inc.exists(p => p._2 >= 1000000L && p._3 == 1.0))
    }
  }

  test("streaming crawl ingest (warc -> quality -> neardup) equals " +
      "the batch path epoch by epoch on the same bytes") {
    import java.util.concurrent.ConcurrentLinkedQueue
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Archive
    import graft.functions.{TextFunctions => T}
    val tS = "crawl_stream_idx"
    val tB = "crawl_batch_idx"
    // epoch payloads: real WARCs around doc text — epoch k wraps
    // the doc_id%3==k third at compression k (plain / gzip-member /
    // zstd-entropy-frame), so the stream faces all three layouts
    def epochBytes(third: Int): Array[(Long, Array[Byte])] = {
      val d = batch.filter(col("doc_id") % 3 === third)
        .select(col("doc_id"), coalesce(col("text"), lit(""))
          .as("__t"), lit(third).cast("int").as("__c"))
      Archive.synthWarcsComp(d, "doc_id", "__t", "__c", "content")
        .select("doc_id", "content")
        .as[(Long, Array[Byte])].collect()
    }
    def batchPath(table: String, rows: Array[(Long, Array[Byte])])
        : Set[(Long, Long, Double)] = {
      val df = rows.toSeq.toDF("doc_id", "content")
      val unwrapped = Archive.warcRecordRowsAuto(df, "doc_id",
          "content")
        .filter(col("warc_type") === "response")
        .select(col("doc_id"), col("body_text").as("__crawl_text"))
        .filter(T.qualityKeep(col("__crawl_text")))
      val pairs = asSet(BandIndex.neardupIncrement(spark, table,
        unwrapped, "doc_id", "__crawl_text"))
      BandIndex.append(spark, table, unwrapped, "doc_id",
        "__crawl_text")
      pairs
    }
    withIndex(tS) {
      withIndex(tB) {
        BandIndex.build(corpus, "doc_id", "text", tS)
        BandIndex.build(corpus, "doc_id", "text", tB)
        implicit val sqlc = spark.sqlContext
        val mem = MemoryStream[(Long, Array[Byte])]
        val got = new ConcurrentLinkedQueue[(Long, Set[(Long, Long,
          Double)])]()
        val q = graft.streaming.StreamingOps.crawlIngest(spark, tS,
          mem.toDF().toDF("doc_id", "content"), "doc_id",
          "content") { (pairs, epoch) =>
          got.add((epoch, pairs.select("id_a", "id_b", "est_jaccard")
            .as[(Long, Long, Double)].collect().toSet))
        }
        try {
          val e1 = epochBytes(0)
          mem.addData(e1.toIndexedSeq)
          q.processAllAvailable()
          val e2 = epochBytes(1)
          mem.addData(e2.toIndexedSeq)
          q.processAllAvailable()
          val e3 = epochBytes(2)
          mem.addData(e3.toIndexedSeq)
          q.processAllAvailable()
          val streamed = got.stream().toArray
            .map(_.asInstanceOf[(Long, Set[(Long, Long, Double)])])
            .sortBy(_._1).map(_._2)
          val b1 = batchPath(tB, e1)
          val b2 = batchPath(tB, e2)
          val b3 = batchPath(tB, e3)
          assert(streamed.length == 3)
          assert(streamed(0) == b1 && b1.nonEmpty)
          assert(streamed(1) == b2)
          assert(streamed(2) == b3)
        } finally q.stop()
      }
    }
  }

  test("streaming ingest flags each micro-batch against the index " +
      "and later epochs dedup against earlier ones") {
    import java.util.concurrent.ConcurrentLinkedQueue
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = "band_spec_stream"
    withIndex(t) {
      BandIndex.build(corpus, "doc_id", "text", t)
      val corpusDoc = corpus.orderBy("doc_id")
        .select("doc_id", "text").as[(Long, String)].head()
      implicit val sqlc = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val got = new ConcurrentLinkedQueue[(Long, Long, Double)]()
      val q = graft.streaming.StreamingOps.neardupIngest(spark, t,
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text") {
        (pairs, _) =>
          pairs.select("id_a", "id_b", "est_jaccard")
            .as[(Long, Long, Double)].collect().foreach(got.add)
      }
      try {
        // epoch 1: an exact copy of a corpus doc, under a fresh id
        mem.addData((5000001L, corpusDoc._2))
        q.processAllAvailable()
        assert(got.stream().anyMatch(p =>
          p._1 == corpusDoc._1 && p._2 == 5000001L && p._3 == 1.0))
        got.clear()
        // epoch 2: a copy of the EPOCH-1 doc — pairs only because the
        // ingest appended epoch 1 to the index
        mem.addData((5000002L, corpusDoc._2))
        q.processAllAvailable()
        assert(got.stream().anyMatch(p =>
          p._1 == 5000001L && p._2 == 5000002L && p._3 == 1.0))
      } finally q.stop()
    }
  }
}
