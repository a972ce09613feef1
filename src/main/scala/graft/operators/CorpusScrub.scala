package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-WIDE text scrubbing — the steps that need global frequency,
  * not per-document signals: removing boilerplate segments that repeat
  * across the corpus (the C4/CCNet "drop duplicated paragraphs" rule)
  * and building frequency vocabularies.
  */
object CorpusScrub {

  /** Remove every segment (paragraph under `sep` = "\n\n", word under
    * `sep` = " ") whose TOTAL occurrence count across the corpus
    * exceeds `maxRepeats`, preserving the order of what survives.
    *
    * Scale shape, deliberately:
    *  1. the frequency aggregation shuffles ONLY 32-byte md5 keys —
    *     segment text is projected away before the exchange, so a
    *     100 TB corpus shuffles gigabytes, not terabytes;
    *  2. the over-frequent key set (count > maxRepeats) is by
    *     construction ≤ corpusSegments / maxRepeats keys — small for
    *     any useful threshold — so AQE broadcasts the left-anti join
    *     and surviving segments never shuffle for the filter;
    *  3. one content shuffle total: the groupBy(id) reassembly (order
    *     restored via sort_array over (pos, segment), not by relying
    *     on any shuffle ordering).
    *
    * Documents whose every segment is scrubbed survive with empty text
    * (left join back to the id spine), so the op never drops rows.
    * Output: idCol, `clean_text`, `n_kept`, `n_removed`.
    */
  def removeRepeatedSegments(df: DataFrame, idCol: String,
      textCol: String, sep: String = "\n\n", maxRepeats: Long = 1L)
      : DataFrame = {
    require(maxRepeats >= 1, s"maxRepeats must be >= 1, got $maxRepeats")
    val segs = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern
          .quote(sep))).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val overCap = segs.select("h")
      .groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxRepeats)
      .select("h")
    val kept = segs.join(overCap, Seq("h"), "left_anti")
      .groupBy("id").agg(
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    // null textCol: split(null) is null so size() is null — coalesce to
    // 0 so n_removed accounts 0 (not null) for null docs, consistent
    // with clean_text='' / n_kept=0
    df.select(col(idCol).as("id"),
        coalesce(
          size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
            .cast("long"),
          lit(0L)).as("__total"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with
    * exact counts, ties broken by token ascending so the cut is total-
    * order deterministic. groupBy/count partial-aggregates map-side;
    * the ordered limit runs as TakeOrderedAndProject (per-partition
    * top-k heaps, never a full sort).
    */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(graft.functions.TextFunctions
        .tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("term_count"))
      .orderBy(col("term_count").desc, col("term").asc)
      .limit(k)
  }

  /** The `k` most characteristic terms per document by TF-IDF.
    *
    * `logIdf = true` (default) scores tf · (ln((N+1)/(df+1)) + 1) —
    * the standard smoothed form. `logIdf = false` scores the exact
    * rational tf · (N+1) / (df+1) (a steeper idf, so rankings can
    * differ from the log form): the int64 product stays exact until
    * one final division, so results are bit-identical across engines
    * and partitionings — ln's last ulp is libm-specific, which is why
    * the cross-engine verification query uses this variant.
    *
    * Shape: token explode → (doc, term) counts (map-side combined) →
    * vocab-sized document frequencies (NOT broadcast-hinted — a web-
    * scale vocabulary outgrows broadcast; AQE picks broadcast when it
    * fits) → corpus size joined as a 1-row broadcast, never a driver
    * action → rank filter (WindowGroupLimit).
    */
  def topTfidfTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, logIdf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf_count"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val score =
      if (logIdf)
        col("tf_count") *
          (log((col("__n") + lit(1L)).cast("double") /
            (col("__df") + lit(1L))) + lit(1.0))
      else
        (col("tf_count") * (col("__n") + lit(1L))).cast("double") /
          (col("__df") + lit(1L))
    val scored = tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("id").as(idCol), col("term"), col("tf_count"),
        score.as("score"))
    Sampling.topKPerGroup(scored, idCol, "score", "term", k)
  }

  /** Per-document templated-ness score against the REST of the
    * corpus: how common are this document's word n-grams elsewhere?
    * Boilerplate-assembled pages (shop listings, mirror shells,
    * generated spam) score high while original prose scores low —
    * the cross-document complement of the within-document repetition
    * signals. Returns (`idCol`, `n_grams` distinct, `mean_df_milli` =
    * Σdf·1000 DIV n_grams where df counts DOCUMENTS containing the
    * gram incl. this one, `shared_frac_milli` = grams-with-df≥2 ·
    * 1000 DIV n_grams). Documents shorter than one n-gram emit the
    * single truncated gram the extractor produces (same convention
    * as the dedup family). All integer — engine-replayable.
    *
    * Shape: one distinct-gram explode, one gram-keyed df aggregate
    * (vocab-sized, map-side combined), one join back, one per-doc
    * aggregation — the standard inverted-index build cost, nothing
    * quadratic.
    */
  def templateScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(col(idCol).as("id"),
      explode(graft.functions.NativeHash
        .distinctWordNGramsColumn(col(textCol), n)).as("gram"))
    val dfT = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    grams.join(dfT, Seq("gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum("__df").as("__sum_df"),
        count(when(col("__df") >= 2, 1)).as("__shared"))
      .select(col("id").as(idCol), col("n_grams"),
        expr("__sum_df * 1000 DIV n_grams").as("mean_df_milli"),
        expr("__shared * 1000 DIV n_grams").as("shared_frac_milli"))
  }

  /** Per-document language-mix report over paragraph segments
    * (`\n\n`-separated): a single doc-level language id mislabels
    * mixed documents — boilerplate quotes, code-switched pages,
    * translated appendices — so segment first, id each segment with
    * the marker-word [[graft.functions.TextFunctions.langId]], then
    * aggregate: (`idCol`, `n_segments`, `n_langs`, `dominant_lang`,
    * `dominant_milli` = dominant-segment-count·1000 DIV n_segments).
    * Dominance ties break to the lexicographically smallest language
    * tag (one deterministic `min(struct(−count, lang))`). Blank
    * segments are dropped before counting.
    *
    * Scale shape: the explode is map-side; two keyed aggregations
    * ((doc, lang) then doc) over segment-count-sized rows — bounded
    * by paragraphs, never tokens.
    */
  def langMix(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val T = graft.functions.TextFunctions
    val segs = df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n\n")).as("seg"))
      .filter(trim(col("seg")) =!= "")
      .select(col("id"), T.langId(col("seg")).as("lang"))
    val perLang = segs.groupBy("id", "lang")
      .agg(count(lit(1)).as("__c"))
    perLang.groupBy("id")
      .agg(sum("__c").as("n_segments"),
        count(lit(1)).as("n_langs"),
        min(struct((-col("__c")).as("nc"), col("lang").as("l")))
          .as("__m"))
      .select(col("id").as(idCol), col("n_segments"),
        col("n_langs"), col("__m.l").as("dominant_lang"),
        expr("(-__m.nc) * 1000 DIV n_segments").as("dominant_milli"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * frequency vocabulary (terms appearing in ≥ `minDf` documents) —
    * high OOV flags word salad, encoding damage, and off-domain text
    * in one integer signal: (`idCol`, `n_tokens`, `n_oov`,
    * `oov_milli` = n_oov·1000 DIV n_tokens, exact).
    *
    * Scale shape: the vocabulary (the SMALL side — frequent terms are
    * few; rare terms, the majority, never materialize as a set) is a
    * df-filtered aggregate and joins the token stream inner-side, so
    * AQE broadcasts it at realistic `minDf`; OOV counts fall out as
    * `n_tokens − n_in_vocab` without ever joining against the huge
    * OOV term set. Two aggregations + one map-only token count.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val T = graft.functions.TextFunctions
    val base = df.select(col(idCol).as("id"),
      T.tokens(col(textCol)).as("__ts"))
    val toks = base.select(col("id"), explode(col("__ts")).as("term"))
    val vocab = toks.distinct()
      .groupBy("term").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("term")
    val nTok = base.select(col("id"),
      size(col("__ts")).cast("long").as("n_tokens"))
    val inVocab = toks.join(vocab, Seq("term"))
      .groupBy("id").agg(count(lit(1)).as("__inv"))
    nTok.join(inVocab, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__inv"), lit(0L)))
          .as("n_oov"))
      .withColumn("oov_milli", expr("n_oov * 1000 DIV n_tokens"))
      .withColumnRenamed("id", idCol)
  }

  /** Per-document mean token log-probability under the corpus's own
    * add-one-smoothed unigram LM — the cheap stand-in for the CCNet/
    * Wikipedia-LM perplexity filter: word salad and boilerplate score
    * far below fluent text drawn from the corpus distribution. Higher
    * (closer to 0) = more typical.
    *
    * Shape: one token-count aggregation builds the LM (vocab-sized,
    * joined un-hinted so AQE broadcasts when it fits), one join scores
    * every token map-side, one (doc, sum/count) aggregation. Returns
    * (idCol, `n_tokens`, `mean_logprob`). Spec-verified only — ln's
    * last ulp is libm-specific, so no cross-engine hash oracle (see
    * [[topTfidfTerms]]).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("term"))
    // the LM is vocab-sized: pin it so the scoring join, the token
    // total and the vocab size all read ONE materialization instead of
    // re-exploding the corpus per reference
    val lm = toks.groupBy("term").agg(count(lit(1)).as("__tc"))
      .localCheckpoint()
    val nTotal = lm.agg(sum("__tc").as("__n"))
    val vocab  = lm.agg(count(lit(1)).as("__v"))
    toks.join(lm, Seq("term"))
      .crossJoin(broadcast(nTotal)).crossJoin(broadcast(vocab))
      .withColumn("__lp",
        log((col("__tc") + lit(1L)).cast("double") /
          (col("__n") + col("__v")).cast("double")))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(col("__lp")).as("mean_logprob"))
  }

  /** One-row corpus HEALTH REPORT — the summary a curation run opens
    * with and gates on: doc/null counts, total whitespace tokens,
    * language count, near-exact duplicate mass (docs beyond their
    * fingerprint group's first), and the quality-filter fail rate —
    * every field an exact integer (`DIV` milli fractions), so the
    * report replays bit-identically on any engine and two runs
    * diff meaningfully.
    *
    * Scale shape: ONE aggregation pass (the exact count-distincts
    * expand the scan 3× map-side — the standard exact-distinct
    * trade; swap for HLL upstream if ±2% is acceptable), no joins,
    * no driver loops. The quality rules are [[graft.functions
    * .TextFunctions.qualityKeep]]'s expression tree inline — null
    * text counts as a fail (it IS unusable), not a skip.
    */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val T = graft.functions.TextFunctions
    val text = col(textCol)
    df.agg(
        count(lit(1)).as("n_docs"),
        count(when(text.isNull, 1)).as("n_null_text"),
        coalesce(sum(when(text.isNotNull,
          T.tokenCount(text).cast("long"))), lit(0L))
          .as("total_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        countDistinct(T.fingerprint(text)).as("__fp"),
        count(when(T.qualityKeep(text) === true, 1)).as("__keep"))
      .withColumn("dup_docs",
        col("n_docs") - col("n_null_text") - col("__fp"))
      .withColumn("dup_frac_milli", expr(
        "dup_docs * 1000 DIV greatest(n_docs - n_null_text, 1)"))
      .withColumn("quality_fail_milli", expr(
        "(n_docs - __keep) * 1000 DIV greatest(n_docs, 1)"))
      .drop("__fp", "__keep")
  }
}
