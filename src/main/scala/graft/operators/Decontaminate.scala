package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.
  BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination — remove training documents that overlap
  * an evaluation set (the classic n-gram contamination rule: a doc
  * sharing any long-enough word n-gram with a benchmark item is
  * tainted).
  *
  * Scale shape: the benchmark side is tiny next to the corpus (eval
  * sets are thousands of items against billions of docs), so its
  * distinct gram set broadcasts and the corpus side joins map-side —
  * corpus grams NEVER shuffle; the only exchange is the per-doc hit
  * count (id, count). Gram extraction is the native one-pass
  * DistinctWordNGrams kernel.
  */
object Decontaminate {

  /** Per-contaminated-doc report: (`idCol`, `n_hits` = distinct shared
    * n-grams). Docs with no overlap are absent.
    */
  def flagContaminated(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = graft.functions.NativeHash
      .distinctWordNGramsColumn(col(textCol), n)
    val benchGrams = bench.select(explode(graft.functions.NativeHash
        .distinctWordNGramsColumn(col(benchTextCol), n)).as("gram"))
      .distinct()
    corpus.select(col(idCol), explode(grams).as("gram"))
      .join(benchGrams, Seq("gram")) // AQE broadcasts the bench side
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with contaminated documents removed. */
  def removeContaminated(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame =
    corpus.join(
      flagContaminated(corpus, idCol, textCol, bench, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** [[flagContaminated]] with a bloom-filter prefilter — same result
    * (bit-for-bit), different scale regime. The plain path ships every
    * corpus gram into a join; when the benchmark side is too big for a
    * clean broadcast (a full eval-harness suite is tens of millions of
    * grams), that join shuffles the CORPUS side — the one thing a
    * 100 TB pipeline cannot afford. Here the benchmark grams fold into
    * one Bloom filter via Spark's own `BloomFilterAggregate` (the
    * codegen'd machinery behind runtime join filtering, partial-merged
    * map-side, one binary blob to the driver), and the corpus grams
    * are prefiltered MAP-SIDE by `BloomFilterMightContain` before any
    * exchange: the ~`fpp` fraction of false positives plus the true
    * hits are all that reach the exact verification join, which then
    * removes the false positives. Correctness never depends on the
    * filter — a Bloom filter has no false negatives, so the prefilter
    * only discards grams the exact join would discard anyway.
    *
    * `expectedGrams` sizes the filter (~1.2 bytes/gram at fpp 0.03);
    * an underestimate degrades fpp (more verify traffic), never the
    * result. The serialized filter rides the plan as a literal, so it
    * broadcasts to executors once per stage — at the default sizing
    * that is a ~1 MB constant, far below any broadcast-join threshold.
    *
    * Sizing bound: Spark SILENTLY clamps `BloomFilterAggregate`'s
    * numItems/numBits to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) and `...maxNumBits` (default 64M bits = 8 MB) — a clamped
    * filter keeps the documented correctness (no false negatives) but
    * quietly delivers a much worse fpp, ballooning verify-join
    * traffic. So oversizing fails loudly here instead: raise those
    * session confs to size past ~7M grams at fpp 0.03.
    */
  def flagContaminatedBloom(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8, expectedGrams: Long = 1L << 20,
      fpp: Double = 0.03): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(expectedGrams > 0, "expectedGrams must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val conf = corpus.sparkSession.conf
    val maxNumItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        "4000000").toLong
    val maxNumBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "67108864").toLong
    require(expectedGrams <= maxNumItems,
      s"expectedGrams ($expectedGrams) exceeds " +
      s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems " +
      s"($maxNumItems): Spark would silently clamp the filter and " +
      "degrade its fpp — raise the session conf to size this filter")
    val benchGrams = bench.select(explode(graft.functions.NativeHash
        .distinctWordNGramsColumn(col(benchTextCol), n)).as("gram"))
      .distinct()
    val numBits = math.ceil(
      -expectedGrams * math.log(fpp) / (math.log(2) * math.log(2)))
      .toLong
    require(numBits <= maxNumBits,
      s"requested fpp $fpp at $expectedGrams grams needs $numBits " +
      s"bits, over spark.sql.optimizer.runtime.bloomFilter.maxNumBits " +
      s"($maxNumBits): Spark would silently clamp and degrade the " +
      "fpp — raise the session conf or accept a larger fpp")
    val bloomAgg = Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("gram"))),
        Literal(expectedGrams), Literal(numBits))
      .toAggregateExpression())
    val bytes = benchGrams.agg(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(xxhash64(col("gram")))))
    corpus.select(col(idCol), explode(graft.functions.NativeHash
        .distinctWordNGramsColumn(col(textCol), n)).as("gram"))
      .filter(mightContain) // map-side: no exchange above this line
      .join(benchGrams, Seq("gram")) // exact: false positives die here
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with contaminated documents removed, bloom-prefiltered
    * (same result as [[removeContaminated]] — see
    * [[flagContaminatedBloom]] for when to prefer it).
    */
  def removeContaminatedBloom(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8, expectedGrams: Long = 1L << 20,
      fpp: Double = 0.03): DataFrame =
    corpus.join(
      flagContaminatedBloom(corpus, idCol, textCol, bench,
        benchTextCol, n, expectedGrams, fpp).select(col(idCol)),
      Seq(idCol), "left_anti")

  // ---------------------------------------------------------------
  // Embedding-space (semantic) contamination — the overlap the
  // n-gram rule cannot see: paraphrases, translations, reformatted
  // copies of benchmark items share no 8-gram with the original but
  // sit next to it in embedding space.
  // ---------------------------------------------------------------

  /** Per-evaluation-item contamination report: `(eval_id, train_id,
    * max_cosine, contaminated)` — the maximum exact quantized cosine
    * any training vector reaches against the eval item, the training
    * row that attains it (ties broken to the smallest train id, so
    * the argmax is deterministic on any engine), and the
    * `>= threshold` flag.
    *
    * Scale shape: eval sets are thousands of items against billions
    * of training rows, so the QUANTIZED eval side broadcasts
    * (|eval| × dim int64, megabytes) and the training corpus is
    * scanned exactly once, map-only: each task folds its partition
    * into |eval| partial (cosine, id) maxima via partial aggregation,
    * and the ONLY exchange is that |eval|-sized max table. Training
    * vectors never shuffle. The scan is the exact-answer baseline —
    * O(|train|·|eval|·dim) work; when that product is too hot, scope
    * the train side first with [[Similarity.ivfTopK]]-style probing
    * and accept approximate recall.
    *
    * Cosine is computed on milli-unit quantized vectors (exact int64
    * dot and norms, one sqrt, one divide — the
    * [[Similarity.cosineQ]] shape), so every score is bit-reproducible
    * and the DuckDB oracle replays it. Zero-norm vectors (cosine
    * undefined) are excluded on both sides: a zero-norm eval item
    * yields no report row.
    */
  def semanticOverlap(train: DataFrame, trainIdCol: String,
      evalDf: DataFrame, evalIdCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // the single-pass argmax negates the train id inside a struct
    // max; a non-numeric id would cast to null and break both the
    // reported train_id and the tie-break — fail loudly instead (a
    // two-phase argmax would be type-generic but costs a SECOND full
    // train scan, the one thing this operator exists to avoid)
    require(train.schema(trainIdCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semanticOverlap needs a numeric train id column; " +
      s"'$trainIdCol' is ${train.schema(trainIdCol).dataType} — " +
      "map string ids to a numeric surrogate first")
    val scored = semanticScores(train, trainIdCol, evalDf, evalIdCol,
      vecCol)
    scored
      .select(col("eval_id"),
        struct(col("__cos").as("c"), (-col("train_id")).as("nid"))
          .as("__m"))
      .groupBy("eval_id")
      .agg(max(col("__m")).as("__m"))
      .select(col("eval_id"),
        (-col("__m.nid")).as("train_id"),
        col("__m.c").as("max_cosine"),
        (col("__m.c") >= threshold).as("contaminated"))
  }

  /** The training corpus with semantically contaminated rows removed:
    * any training vector within `threshold` cosine of ANY eval item
    * is dropped (the direction that keeps a benchmark valid — the
    * benchmark stays fixed, the training set gives way).
    *
    * Same broadcast-eval scan as [[semanticOverlap]], but the
    * threshold filter runs MAP-SIDE on the scored pairs, so only the
    * (small) contaminated-id set reaches the distinct + anti-join —
    * at scale AQE broadcasts it and the corpus never shuffles.
    */
  def semanticScrubTrain(train: DataFrame, trainIdCol: String,
      evalDf: DataFrame, evalIdCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val hit = semanticScores(train, trainIdCol, evalDf, evalIdCol,
        vecCol)
      .filter(col("__cos") >= threshold)
      .select(col("train_id").as(trainIdCol))
      .distinct()
    train.join(hit, Seq(trainIdCol), "left_anti")
  }

  /** Shared scan: every (train, eval) pair with its exact quantized
    * cosine as `__cos` — train side streamed, eval side broadcast.
    */
  private def semanticScores(train: DataFrame, trainIdCol: String,
      evalDf: DataFrame, evalIdCol: String, vecCol: String)
      : DataFrame = {
    def quantized(df: DataFrame, id: String, idAs: String,
        vAs: String): DataFrame =
      df.select(col(id).as(idAs),
          Similarity.quantize(col(vecCol)).as(vAs))
        .withColumn(s"${vAs}_n", Similarity.dotQ(col(vAs), col(vAs)))
        .filter(col(s"${vAs}_n") > 0)
    val ev = quantized(evalDf, evalIdCol, "eval_id", "__ev")
    val tr = quantized(train, trainIdCol, "train_id", "__tv")
    tr.crossJoin(broadcast(ev))
      .withColumn("__cos",
        Similarity.dotQ(col("__ev"), col("__tv")).cast("double") /
          sqrt(col("__ev_n").cast("double") *
               col("__tv_n").cast("double")))
  }
}
