package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus — BM25 scoring in EXACT
  * fixed-point integer arithmetic, so rankings are bit-identical on
  * any engine/partitioning and the DuckDB oracle replays them.
  *
  * Scoring (all int64, milli/micro units, every division a truncating
  * `DIV` on non-negative operands):
  *
  *   dlnorm_milli = (1000−b) + (b · dl · N) DIV totalTokens
  *   denom_milli  = tf·1000 + (k1 · dlnorm_milli) DIV 1000
  *   tfw_milli    = (tf · (k1+1000) · 1000) DIV denom_milli
  *   idf_milli    = ((2·(N−df) + 1) · 1000) DIV (2·df + 1)
  *   score_micro  = Σ_{t ∈ q∩d} idf_milli(t) · tfw_milli(t,d)
  *
  * `tfw` is the classic BM25 saturation term with k1 = k1Milli/1000
  * and b = bMilli/1000. `idf` is the RATIONAL form — the exact ratio
  * (N−df+½)/(df+½) whose logarithm is the textbook BM25 idf. The log
  * is deliberately dropped (a cross-libm `ln` differs in the last ulp,
  * breaking bit-reproducibility — same trade as
  * [[Collocations]]' lift vs PMI): the ratio is monotone in the
  * textbook idf per term, weighting rare terms more aggressively than
  * the log form when scores SUM across terms. For corpus-scale
  * filtering/linking (find the source for this quote, link eval items
  * to corpus evidence) that bias toward the rarest shared term is the
  * behavior you want anyway.
  *
  * Scale shape: query sets are small next to the corpus, so the
  * DISTINCT query vocabulary broadcasts and prunes the exploded corpus
  * tokens MAP-SIDE — only query-term hits ever reach the (doc, term)
  * aggregation. Document length is carried through that same explode
  * (no corpus-sized length join), df is a vocab-sized aggregate of the
  * hit table, and the final per-(query, doc) sum + top-k ranks with a
  * rank-pushdown window (WindowGroupLimit keeps k rows per query per
  * partition before the exchange). The corpus is tokenized in TWO
  * passes — one |corpus|-collapsing stats aggregate (N, total
  * tokens) and one hit-pruning explode; caching the tokenized corpus
  * to dodge the second pass would materialize token arrays at corpus
  * scale, which is worse than re-scanning. Amortize repeated queries
  * through [[TextIndex]] instead, which pays the tokenization once at
  * build.
  */
object Retrieval {

  /** Top-`k` documents per query by the fixed-point BM25 score:
    * `(qidCol, idCol, score_micro, rank)`, rank 1 = best, ties broken
    * to the smallest document id. Documents sharing no term with a
    * query are unscored (a query matching nothing yields no rows).
    * Duplicate query terms count once (classic BM25 qtf ≈ 1 form).
    *
    * Contract: the corpus has at least one token (totalTokens > 0 —
    * ANSI division would otherwise fail loudly on the empty corpus).
    */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1Milli: Long = 1200L, bMilli: Long = 750L)
      : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1Milli >= 0, s"k1Milli must be >= 0, got $k1Milli")
    require(bMilli >= 0 && bMilli <= 1000,
      s"bMilli must be in [0, 1000], got $bMilli")
    val T = graft.functions.TextFunctions
    val toks = corpus.select(col(idCol).as("__doc"),
      T.tokens(col(textCol)).as("__ts"))
    val totals = toks.agg(count(lit(1)).as("__nd"),
      sum(size(col("__ts")).cast("long")).as("__tt"))
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(T.tokens(col(qtextCol)))).as("term"))
    val qvocab = qterms.select("term").distinct()
    // map-side prune BEFORE the (doc, term) aggregation: only tokens
    // in the broadcast query vocabulary survive the explode
    val hits = toks
      .select(col("__doc"), size(col("__ts")).cast("long").as("__dl"),
        explode(col("__ts")).as("term"))
      .join(broadcast(qvocab), Seq("term"))
      .groupBy("__doc", "term")
      .agg(count(lit(1)).as("__tf"), max("__dl").as("__dl"))
    val dft = hits.groupBy("term").agg(count(lit(1)).as("__df"))
    val scored = withBm25Cols(
      hits
        .join(dft, Seq("term")) // vocab-sized: AQE broadcasts
        .crossJoin(broadcast(totals)),
      k1Milli, bMilli)
    val perDoc = scored.join(broadcast(qterms), Seq("term"))
      .groupBy("__qid", "__doc")
      .agg(sum(col("__idf") * col("__tfw")).as("score_micro"))
    rankTopK(perDoc, k)
      .select(col("__qid").as(qidCol), col("__doc").as(idCol),
        col("score_micro"), col("rank"))
  }

  /** The fixed-point scoring columns, shared verbatim by the direct
    * path and [[TextIndex.query]] so serve == scan bit-for-bit:
    * requires `__tf, __dl, __df, __nd, __tt`; appends `__tfw, __idf`.
    */
  private[operators] def withBm25Cols(df: DataFrame, k1Milli: Long,
      bMilli: Long): DataFrame =
    df.withColumn("__dlnorm", lit(1000L - bMilli) +
        expr(s"($bMilli * __dl * __nd) DIV __tt"))
      .withColumn("__denom", col("__tf") * lit(1000L) +
        expr(s"($k1Milli * __dlnorm) DIV 1000"))
      .withColumn("__tfw",
        expr(s"(__tf * ${k1Milli + 1000L} * 1000) DIV __denom"))
      .withColumn("__idf",
        expr("((2 * (__nd - __df) + 1) * 1000) DIV (2 * __df + 1)"))

  /** Shared (score DESC, doc ASC) rank-≤-k window over a
    * `(__qid, __doc, score_micro)` table; `rank` comes back long.
    */
  private[operators] def rankTopK(perDoc: DataFrame, k: Int)
      : DataFrame = {
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score_micro").desc, col("__doc").asc)
    perDoc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }
}
