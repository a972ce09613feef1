package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextIndex}

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "quantum flux capacitor design notes and measurements"),
    (2L, "cooking pasta with garlic and olive oil at home"),
    (3L, "the quantum capacitor flux paper quantum quantum"),
    (4L, "garlic garlic garlic garlic garlic garlic garlic"),
    (5L, "unrelated text about medieval castle architecture")
  ).toDF("doc_id", "text")
  private val queries = Seq(
    (100L, "quantum capacitor"), (101L, "garlic oil"),
    (102L, "medieval and")).toDF("query_id", "qtext")

  test("index serve equals the direct BM25 scan bit-for-bit") {
    val t = "graft_test_text_index"
    TextIndex.build(corpus, "doc_id", "text", t, buckets = 4)
    try {
      val served = TextIndex.query(spark, t, queries, "query_id",
          "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      val direct = Retrieval.bm25TopK(corpus, "doc_id", "text",
          queries, "query_id", "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(served == direct && served.nonEmpty)
    } finally Seq(t, s"${t}_stats")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("postings carry denormalized df and dl; stats hold corpus " +
      "totals") {
    val t = "graft_test_text_index2"
    TextIndex.build(corpus, "doc_id", "text", t, buckets = 2)
    try {
      val posts = spark.table(t)
        .select("term", "doc_id", "tf", "dl", "df")
        .as[(String, Long, Long, Long, Long)].collect()
      val garlic = posts.filter(_._1 == "garlic")
      assert(garlic.map(_._2).toSet == Set(2L, 4L))
      assert(garlic.forall(_._5 == 2L)) // df = 2 on every posting
      assert(garlic.find(_._2 == 4L).get._3 == 7L) // tf in doc 4
      assert(garlic.find(_._2 == 4L).get._4 == 7L) // dl of doc 4
      val (nd, tt) = spark.table(s"${t}_stats")
        .as[(Long, Long)].head()
      assert(nd == 5L && tt == posts.filter(_._3 > 0)
        .groupBy(_._2).map(_._2.head._4).sum)
    } finally Seq(t, s"${t}_stats")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("serving scan is bucket-pruned to the query terms; no-match " +
      "query yields no rows") {
    val t = "graft_test_text_index3"
    TextIndex.build(corpus, "doc_id", "text", t, buckets = 4)
    try {
      val q = Seq((1L, "quantum")).toDF("query_id", "qtext")
      val plan = TextIndex.query(spark, t, q, "query_id", "qtext", 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"no bucket pruning in:\n$plan")
      val none = TextIndex.query(spark, t,
        Seq((1L, "zzzz yyyy")).toDF("query_id", "qtext"),
        "query_id", "qtext", 5)
      assert(none.count() == 0L)
    } finally Seq(t, s"${t}_stats")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  private val moreDocs = Seq(
    (6L, "quantum garlic fusion cuisine experiments"),
    (7L, "flux measurements of pasta architecture"),
    (8L, "quantum quantum capacitor capacitor oil")
  ).toDF("doc_id", "text")

  test("appendDocs == from-scratch rebuild over the union corpus, " +
      "bit-for-bit (df recomputed at serve)") {
    val (inc, full) = ("graft_test_ti_inc", "graft_test_ti_full")
    TextIndex.build(corpus, "doc_id", "text", inc, buckets = 4)
    TextIndex.build(corpus.unionByName(moreDocs), "doc_id", "text",
      full, buckets = 4)
    try {
      val n = TextIndex.appendDocs(moreDocs, "doc_id", "text", inc)
      assert(n == 3L)
      val served = TextIndex.query(spark, inc, queries, "query_id",
          "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      val rebuilt = TextIndex.query(spark, full, queries, "query_id",
          "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(served == rebuilt && served.nonEmpty)
      // the append changed idf for terms the batch touched — the
      // equality above is only meaningful if the direct scan agrees
      val direct = Retrieval.bm25TopK(
          corpus.unionByName(moreDocs), "doc_id", "text",
          queries, "query_id", "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(served == direct)
      // stats merged by addition
      val (nd, tt) = spark.table(s"${inc}_stats")
        .as[(Long, Long)].head()
      val (fnd, ftt) = spark.table(s"${full}_stats")
        .as[(Long, Long)].head()
      assert(nd == fnd && tt == ftt)
    } finally Seq(inc, s"${inc}_stats", s"${inc}_delta", full,
        s"${full}_stats", s"${full}_delta")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("compact folds deltas into the bucketed base and preserves " +
      "results; multiple appends stack") {
    val t = "graft_test_ti_compact"
    TextIndex.build(corpus, "doc_id", "text", t, buckets = 4)
    try {
      TextIndex.appendDocs(moreDocs.filter(col("doc_id") < 8),
        "doc_id", "text", t)
      TextIndex.appendDocs(moreDocs.filter(col("doc_id") === 8),
        "doc_id", "text", t)
      val before = TextIndex.query(spark, t, queries, "query_id",
          "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      TextIndex.compact(spark, t, buckets = 4)
      assert(!spark.catalog.tableExists(s"${t}_delta"))
      val after = TextIndex.query(spark, t, queries, "query_id",
          "qtext", k = 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(after == before && after.nonEmpty)
      // compacted base carries corrected denormalized df
      val qdf = spark.table(t).filter(col("term") === "quantum")
        .select("df").distinct().as[Long].collect().toSeq
      assert(qdf == Seq(4L)) // docs 1, 3, 6, 8
      // and the compacted serve path is bucket-pruned again
      val plan = TextIndex.query(spark, t,
          Seq((1L, "quantum")).toDF("query_id", "qtext"),
          "query_id", "qtext", 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"))
    } finally Seq(t, s"${t}_stats", s"${t}_delta",
        s"${t}_compacting")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("build's pinned term exchange writes exactly one file per " +
      "bucket") {
    // r19: the term exchange is pinned at the bucket count so the
    // bucketed write spreads across bucket tasks — and emits one file
    // per bucket instead of (write tasks × buckets)
    val t = "g_textindex_pin_spec"
    try {
      val docs = (1 to 200).map(i =>
        (i.toLong, s"alpha beta w$i gamma w${i % 7}"))
        .toDF("doc_id", "text")
      TextIndex.build(docs, "doc_id", "text", t, buckets = 8)
      val loc = spark.sql(s"DESCRIBE FORMATTED $t")
        .filter(col("col_name") === "Location")
        .select("data_type").as[String].head()
      val dir = new java.io.File(new java.net.URI(loc))
      val files = dir.listFiles.filter(f =>
        f.getName.startsWith("part-")).toSeq
      assert(files.size == 8, s"want 8 bucket files, got ${files.size}")
    } finally Seq(t, s"${t}_stats", s"${t}_delta")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }
}
