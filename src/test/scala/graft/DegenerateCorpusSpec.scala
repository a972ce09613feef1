package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DictionaryFit, Similarity}

/** Adversarial degenerate corpora — the inputs a 100 TB crawl actually
  * contains (mass-duplicated boilerplate, template pages, constant
  * embeddings, key-like "categoricals") — aimed at the scale guards:
  * `maxBucket` on every LSH bucket, `dfCap` on the n-gram inverted
  * index, the dictionary-fit cardinality cap. The reference's datasim
  * tests (reference tests/datasim.py:59-488) inject known defects and
  * assert the handling; these do the same for the guards, so the caps
  * are verified behavior, not documentation.
  *
  * Contract verified for each pair operator:
  *  1. the op COMPLETES on the degenerate corpus (no quadratic stage —
  *     with the cap disabled the same corpus would materialize ~N²/2
  *     pairs from one bucket);
  *  2. the cap visibly engaged: pairs internal to the degenerate
  *     cluster are dropped (the DOCUMENTED loss — mass duplicates are
  *     exact-dedup's job, and [[Dedup.exact]] still catches them);
  *  3. honest near-dup pairs OUTSIDE the degenerate bucket survive.
  */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  /** `n` byte-identical documents (every signature collides) plus one
    * honest near-dup pair with unique long text.
    */
  private def identicalCorpus(n: Int): DataFrame = {
    val boiler = (0 until n).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet the same page every time"))
    val honestA = (9000L,
      "a genuinely unique document about distributed query engines " +
      "and the cost model of shuffle exchanges in analytical plans")
    val honestB = (9001L,
      "a genuinely unique document about distributed query engines " +
      "and the cost model of shuffle exchanges in analytical planz")
    (boiler :+ honestA :+ honestB).toDF("doc_id", "text")
  }

  test("minhash: degenerate band bucket is dropped, honest pair survives") {
    val df = identicalCorpus(120)
    val capped = Dedup.minhashDupPairs(df, "doc_id", "text",
        maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // loss is exactly the identical cluster; the unique near-dups remain
    assert(capped.toSeq == Seq((9000L, 9001L)))
    // control: with the cap above the cluster size the same op reports
    // the full quadratic cluster — what the cap is protecting against
    val uncapped = Dedup.minhashDupPairs(df, "doc_id", "text",
      maxBucket = 10000).count()
    assert(uncapped == 120L * 119 / 2 + 1)
  }

  test("simhash: degenerate chunk bucket is dropped, honest pair survives") {
    // the honest pair is byte-identical (hamming 0 — a one-word edit
    // flips an unbounded number of simhash vote bits, so it would test
    // recall, not the cap); the cluster of 120 shares every chunk
    // bucket and must be dropped while the pair's size-2 bucket passes
    val honest = "a genuinely unique document about distributed " +
      "query engines and the cost model of shuffle exchanges"
    val df = ((0 until 120).map(i =>
        (i.toLong, "lorem ipsum dolor sit amet the same page every time"))
      ++ Seq((9000L, honest), (9001L, honest))).toDF("doc_id", "text")
    val capped = Dedup.simhashDupPairs(df, "doc_id", "text",
        maxDist = 3, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(capped.toSeq == Seq((9000L, 9001L)))
    assert(Dedup.simhashDupPairs(df, "doc_id", "text", maxDist = 3,
      maxBucket = 10000).count() == 120L * 119 / 2 + 1)
  }

  test("cosine dup: constant-embedding bucket is dropped, op completes") {
    val constant = (0 until 150).map(i =>
      (i.toLong, Seq.fill(16)(0.5f)))
    val pairA = (9000L, Seq.tabulate(16)(j => if (j == 0) 1.0f else 0.001f))
    val pairB = (9001L, Seq.tabulate(16)(j => if (j == 0) 1.0f else 0.0011f))
    val lonely = (9002L, Seq.tabulate(16)(j => if (j == 3) -1.0f else 0.0f))
    val df = (constant :+ pairA :+ pairB :+ lonely)
      .toDF("vec_id", "embedding")
    val capped = Similarity.cosineDupPairs(df, "vec_id", "embedding",
        dim = 16, threshold = 0.99, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(capped.toSeq == Seq((9000L, 9001L)))
    assert(Similarity.cosineDupPairs(df, "vec_id", "embedding",
      dim = 16, threshold = 0.99, maxBucket = 10000)
      .count() == 150L * 149 / 2 + 1)
  }

  test("ngram: boilerplate gram above dfCap is pruned from the index") {
    // every page carries the same footer; only two share real content.
    // The footer grams' document frequency (120) exceeds dfCap (50), so
    // the index drops them — no near-cartesian gram group is built and
    // footer-only overlap produces NO candidate.
    val footer = "subscribe to our newsletter for updates today"
    val pages = (0 until 120).map(i =>
      (i.toLong, s"page number $i content token${i}a token${i}b $footer"))
    val dupA = (9000L,
      s"the complete guide to columnar storage formats and encodings $footer")
    val dupB = (9001L,
      s"the complete guide to columnar storage formats and encoding $footer")
    val df = (pages :+ dupA :+ dupB).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        threshold = 0.3, dfCap = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((9000L, 9001L)))
  }

  test("ngram: minShared floor prunes single-incidental-phrase pairs") {
    // two documents sharing exactly ONE rare gram are never candidates
    val df = Seq(
      (1L, "alpha beta gamma unique one two three"),
      (2L, "alpha beta gamma other four five six"),
      (3L, "totally unrelated text seven eight nine")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      threshold = 0.0, dfCap = 100, minShared = 3)
    assert(out.count() == 0) // docs 1,2 share one 3-gram < minShared
  }

  test("the documented loss is exact-dedup's catch: identical docs group") {
    val df = identicalCorpus(120)
    val groups = Dedup.exact(df, Seq("text"), "doc_id")
      .select("n_dups").as[Long].collect().sorted
    assert(groups.toSeq == Seq(1L, 1L, 120L))
  }

  test("cluster collapse recovers planted clusters exactly at 20k nodes") {
    // 500 clusters of 8 planted as sparse PATH graphs — the worst
    // diameter shape per edge count — among 16k singleton nodes
    import graft.operators.Dedup
    val nodes = (0L until 20000L).toDF("id")
    val pairs = (0 until 500).flatMap { c =>
      val base = c * 8L
      (0 until 7).map(i => (base + i, base + i + 1))
    }.toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(nodes, "id", pairs)
      .as[(Long, Long)].collect()
    assert(labels.length == 20000)
    labels.foreach { case (id, cl) =>
      val want = if (id < 4000L) id / 8 * 8 else id
      assert(cl == want, s"node $id labeled $cl, want $want")
    }
  }

  test("dedupCorpus keeps exactly one doc per planted cluster") {
    import graft.operators.Dedup
    val docs = (0L until 4000L).map(i => (i, s"text of ${i / 8}"))
      .toDF("doc_id", "text") // 500 clusters of 8 by construction
    // star pairs: each member linked to its cluster's min id
    val expanded = docs.select(col("doc_id"),
        (col("doc_id") - (col("doc_id") % 8)).as("rep"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
    val clean = Dedup.dedupCorpus(docs, "doc_id", expanded)
    assert(clean.count() == 500)
    assert(clean.filter(col("doc_id") % 8 =!= 0).count() == 0)
  }

  test("corpus scrub: a 50k-occurrence segment stays a 1-key drop set") {
    import graft.operators.CorpusScrub
    val boiler = "subscribe now"
    val docs = (0L until 25000L)
      .map(i => (i, s"$boiler\n\nunique paragraph $i"))
      .toDF("doc_id", "text")
    val out = CorpusScrub.removeRepeatedSegments(docs, "doc_id",
      "text", maxRepeats = 100)
    val sample = out.filter(col("doc_id") === 7L)
      .select("clean_text").as[String].collect()(0)
    assert(sample == "unique paragraph 7")
    assert(out.count() == 25000) // no doc dropped
    assert(out.agg(sum("n_removed")).as[Long].collect()(0) == 25000)
  }

  test("chunking a 200k-token doc expands to the exact bound") {
    import graft.operators.Chunking
    val doc = (0 until 200000).map(i => "t").mkString(" ")
    val out = Chunking.chunkByTokens(
      Seq((1L, doc)).toDF("id", "text"), "id", "text",
      maxTokens = 1024, overlap = 64)
    // 1 + ceil((200000 - 1024) / 960) windows
    assert(out.count() == 1 + (200000 - 1024 + 959) / 960)
  }

  test("tfidf on an all-identical corpus stays deterministic") {
    import graft.operators.CorpusScrub
    val docs = (0L until 2000L).map(i => (i, "same words every time"))
      .toDF("doc_id", "text")
    val out = CorpusScrub
      .topTfidfTerms(docs, "doc_id", "text", k = 2, logIdf = false)
      .as[(Long, String, Long, Double)].collect()
    assert(out.length == 4000)
    // every doc gets the same deterministic (score desc, term asc) cut
    assert(out.forall(r => r._2 == "every" || r._2 == "same"))
  }

  test("PCA on a constant corpus: zero variance everywhere, fit " +
      "still deterministic") {
    import spark.implicits._
    val const = (1 to 50).map(i => (i.toLong, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val m = graft.operators.VectorStats.pcaFit(const, "embedding", 2)
    assert(m.variance.forall(v => math.abs(v) < 1e-9))
    // projections of a constant corpus are all identical
    val proj = graft.operators.VectorStats
      .pcaProjectVec(const, "vec_id", "embedding", m)
      .select("proj").collect().map(_.getSeq[Double](0))
    assert(proj.distinct.length == 1)
  }

  test("PQ fit on a constant corpus converges to one honest code") {
    import spark.implicits._
    val const = (1 to 40).map(i => (i.toLong, Seq.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    val cb = graft.operators.ProductQuant.pqFit(const, "vec_id",
      "embedding", m = 2, ksub = 4, iters = 2)
    // every centroid collapses onto the constant subvector; encode
    // then picks code 0 (lowest-index tie) for every row
    val codes = graft.operators.ProductQuant
      .pqEncode(const, "vec_id", "embedding", cb)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(_ == Seq(0, 0)))
  }

  test("correlation on a two-row frame and an all-null column " +
      "degrades to null, never throws") {
    import spark.implicits._
    val tiny = Seq((1.0, 2.0), (2.0, 4.0)).toDF("x", "y")
    val got = graft.operators.ColumnStats
      .correlationMatrix(tiny, Seq("x" -> 1, "y" -> 1)).collect()(0)
    assert(!got.isNullAt(2) && got.getDouble(2) == 1.0)
    val nulls = Seq((Some(1.0), None: Option[Double]),
      (Some(2.0), None)).toDF("x", "y")
    // complete-case drop leaves zero rows -> null corr, no throw
    val gn = graft.operators.ColumnStats
      .correlationMatrix(nulls, Seq("x" -> 1, "y" -> 1)).collect()(0)
    assert(gn.isNullAt(2))
  }

  test("dictionary fit refuses a 10k+-cardinality 'categorical'") {
    // a key column smuggled in as a categorical: the DEFAULT guard
    // (10000) must throw the typed error instead of collecting an
    // unbounded dictionary to the driver
    val df = (0 until DictionaryFit.DefaultMaxCategories + 1)
      .map(i => s"key_$i").toDF("c")
    val e = intercept[IllegalArgumentException] {
      graft.operators.EncodeSingleCategorical("c")(df)
    }
    assert(e.getMessage.contains("not categorical"))
  }

  test("round-9 operators on empty/degenerate inputs: empty results, " +
      "not crashes") {
    import graft.operators.{Dedup, EventOps, Retrieval, Sampling,
      Snapshot}
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    val someDocs  = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("id", "text")
    val qs = Seq((1L, "alpha")).toDF("qid", "qt")
    // BM25: empty corpus, and queries matching nothing
    assert(Retrieval.bm25TopK(emptyDocs, "id", "text", qs, "qid",
      "qt", 5).count() == 0L)
    assert(Retrieval.bm25TopK(someDocs, "id", "text",
      Seq((1L, "zzz")).toDF("qid", "qt"), "qid", "qt", 5)
      .count() == 0L)
    // temperature mix on an empty frame: empty, not an exception
    val emptyTok = Seq.empty[(Long, String, Long)]
      .toDF("id", "src", "tok")
    assert(Sampling.temperatureMix(emptyTok, "id", "tok", "src",
      100L).count() == 0L)
    // rate spikes with a single event: one bucket, its own median
    val oneEv = Seq((1L,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val rs = EventOps.rateSpikes(oneEv, "user_id", "ts")
      .as[(Long, java.sql.Timestamp, Long, Long, Boolean)].collect()
    assert(rs.length == 1 && rs.head._3 == 1L && rs.head._4 == 1L &&
      !rs.head._5)
    // snapshot diff where one side is empty: all added / all removed
    val st = Snapshot.contentDiff(emptyDocs, someDocs, "id",
      Seq("text")).select("status").as[String].collect()
    assert(st.toSet == Set("added") && st.length == 2)
    // edit pairs on sub-trigram-length fields: no candidates at all
    assert(Dedup.editDistancePairs(
      Seq((1L, "ab"), (2L, "ac")).toDF("id", "t"), "id", "t")
      .count() == 0L)
  }
}
