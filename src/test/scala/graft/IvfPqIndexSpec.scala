package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPqIndex, ProductQuant}
import graft.operators.ProductQuant.PqCodebook

class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  private val cb = PqCodebook(Seq.fill(2)(
    Seq(-800L, -200L, 200L, 800L).map(c => Seq.fill(4)(c))))

  test("built index reproduces ivfPqTopK exactly, prunes buckets, " +
      "and stores codes only") {
    val corpus  = randomVecs(600, 8, seed = 11)
    val queries = corpus.filter(col("vec_id") % 97 === 0)
    val t = "ivfpq_spec_idx"
    try {
      IvfPqIndex.build(corpus, "vec_id", "embedding", t, cb,
        nCentroids = 8, kmeansIters = 2, buckets = 8)
      val viaIndex = IvfPqIndex.query(spark, t, queries,
          "vec_id", "embedding", k = 5, nProbe = 2)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      val direct = ProductQuant.ivfPqTopK(corpus, queries,
          "vec_id", "embedding", cb, k = 5, nCentroids = 8,
          nProbe = 2, kmeansIters = 2)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(viaIndex == direct && viaIndex.nonEmpty)
      // compressed on disk: the index table carries codes, never the
      // raw or quantized vectors
      val cols = spark.table(t).columns.toSet
      assert(cols == Set("neighbor_id", "codes", "__list"), cols)
      // probed-list filter prunes unread buckets at the scan
      val plan = IvfPqIndex.query(spark, t, queries,
        "vec_id", "embedding", k = 5, nProbe = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"no bucket pruning in:\n$plan")
    } finally {
      Seq(t, s"${t}_centroids", s"${t}_codebook", s"${t}_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("auto-k build routes past the flat ceiling through the " +
      "two-level fit: >4096 stored lists, serving still prunes") {
    // targetListSize=1 over 6000 rows -> auto k = 6000 > FlatKCeiling
    // = 4096, so the BUILD takes the hierarchical fit — the exact
    // path a 100 TB index needs; the stored layout stays the flat
    // (list_id, vec) table, so the reader is oblivious. (Stored list
    // count lands below the 6000 target — tops own at most k2 seed
    // slots — but must still clear the ceiling no flat fit crosses.)
    val corpus  = randomVecs(6000, 8, seed = 53)
    val queries = corpus.filter(col("vec_id") % 997 === 0)
    val t = "ivfpq_spec_auto"
    try {
      IvfPqIndex.build(corpus, "vec_id", "embedding", t, cb,
        nCentroids = 0, kmeansIters = 1, buckets = 32,
        targetListSize = 1L)
      val nLists = spark.table(s"${t}_centroids").count()
      assert(nLists > graft.operators.Similarity.FlatKCeiling,
        s"auto fit stayed flat-sized: $nLists lists")
      val meta = spark.table(s"${t}_meta").collect()(0)
      assert(meta.getAs[Int]("n_centroids") == nLists.toInt)
      // every stored assignment is a REAL list id of the hierarchy
      val range = spark.table(t)
        .agg(min("__list"), max("__list")).collect()(0)
      assert(range.getInt(0) >= 0 && range.getInt(1) < nLists)
      val res = IvfPqIndex.query(spark, t, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
      val rows = res.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect()
      assert(rows.nonEmpty)
      assert(rows.forall { case (q, nb, r) => q != nb && r <= 3 })
      // bucket pruning survives the auto-k layout
      val plan = IvfPqIndex.query(spark, t, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"no bucket pruning in:\n$plan")
    } finally {
      Seq(t, s"${t}_centroids", s"${t}_codebook", s"${t}_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("append encodes with the stored quantizers: index equals a " +
      "from-scratch build over the union") {
    val base  = randomVecs(200, 8, seed = 31)
    val batch = randomVecs(80, 8, seed = 37)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val queries = base.filter(col("vec_id") <= 3)
    val t = "ivfpq_spec_app"
    try {
      IvfPqIndex.build(base, "vec_id", "embedding", t, cb,
        nCentroids = 4, kmeansIters = 1, buckets = 4)
      IvfPqIndex.append(spark, t, batch, "vec_id", "embedding")
      assert(spark.table(t).count() == 280)
      // appended rows must rank identically to direct ivfPqTopK over
      // the union WITH THE BASE-FITTED quantizer: reproduce it by
      // encoding the union through the stored reader state
      val got = IvfPqIndex.query(spark, t, queries, "vec_id",
          "embedding", k = 6, nProbe = 4)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      val r = IvfPqIndex.reader(spark, t)
      val want = ProductQuant.pqTopK(base.unionByName(batch), queries,
          "vec_id", "embedding", r.codebook, k = 6)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      // nProbe = nCentroids -> every list probed -> equals flat PQ
      assert(got == want && got.nonEmpty)
    } finally {
      Seq(t, s"${t}_centroids", s"${t}_codebook", s"${t}_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("streaming ANN ingest: each epoch searches the standing " +
      "index and later epochs see earlier appends") {
    import java.util.concurrent.ConcurrentLinkedQueue
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = randomVecs(100, 8, seed = 41)
    val probe = base.filter(col("vec_id") === 7L)
      .select("embedding").as[Seq[Float]].head()
    val t = "ivfpq_spec_stream"
    try {
      IvfPqIndex.build(base, "vec_id", "embedding", t, cb,
        nCentroids = 4, kmeansIters = 1, buckets = 4)
      implicit val sqlc = spark.sqlContext
      val mem = MemoryStream[(Long, Seq[Float])]
      val got = new ConcurrentLinkedQueue[(Long, Long, Int)]()
      // k >= corpus size: every probed row ranks, so tie classes
      // (ADC cannot separate same-code rows) never hide a hit
      val q = graft.streaming.StreamingOps.annIngest(spark, t,
        mem.toDF().toDF("vec_id", "embedding"), "vec_id",
        "embedding", k = 200, nProbe = 4) { (hits, _) =>
        hits.select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().foreach(got.add)
      }
      try {
        // epoch 1: the stream's search must equal a direct one-shot
        // query of the same batch against the same index
        mem.addData((9001L, probe))
        q.processAllAvailable()
        val epoch1 = got.stream().toArray.toSeq
          .map(_.asInstanceOf[(Long, Long, Int)]).toSet
        val want = IvfPqIndex.query(spark, t,
            Seq((9001L, probe)).toDF("vec_id", "embedding"),
            "vec_id", "embedding", k = 200, nProbe = 4)
          .select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
        // NOTE: the direct query runs AFTER the epoch-1 append, so it
        // also sees row 9001 itself — exclude self-pairs both sides
        assert(epoch1 == want.filter(_._2 != 9001L) && epoch1.nonEmpty)
        got.clear()
        // epoch 2: the epoch-1 append must be visible
        mem.addData((9002L, probe))
        q.processAllAvailable()
        val hits2 = got.stream().toArray.toSeq
          .map(_.asInstanceOf[(Long, Long, Int)])
        assert(hits2.exists(p => p._1 == 9002L && p._2 == 9001L),
          s"epoch-1 append invisible to epoch 2 (${hits2.size} hits)")
      } finally q.stop()
    } finally {
      Seq(t, s"${t}_centroids", s"${t}_codebook", s"${t}_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("reader round-trips the codebook from disk and full probe " +
      "equals flat pqTopK") {
    val corpus  = randomVecs(200, 8, seed = 23)
    val queries = corpus.filter(col("vec_id") <= 3)
    val t = "ivfpq_spec_cb"
    try {
      IvfPqIndex.build(corpus, "vec_id", "embedding", t, cb,
        nCentroids = 4, kmeansIters = 1, buckets = 4)
      val r = IvfPqIndex.reader(spark, t)
      assert(r.codebook == cb)
      val full = r.query(queries, "vec_id", "embedding", k = 4,
          nProbe = 4)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      val flat = ProductQuant.pqTopK(corpus, queries, "vec_id",
          "embedding", cb, k = 4)
        .select("query_id", "neighbor_id", "adist2", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(full == flat && full.nonEmpty)
    } finally {
      Seq(t, s"${t}_centroids", s"${t}_codebook", s"${t}_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }
}
