package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent inverted text index — the [[Retrieval]] BM25 scan's
  * build-once/serve-many form, the text analog of [[IvfIndex]]: the
  * per-call [[Retrieval.bm25TopK]] re-tokenizes and re-scans the whole
  * corpus; here the postings land on disk BUCKETED BY TERM, so a query
  * batch reads only its terms' buckets (bucket pruning at the scan —
  * no shuffle, no re-tokenization, the corpus text never read again).
  *
  * Layout: `<table>` = (term, doc_id, tf, dl, df) bucketed+sorted by
  * term — df is denormalized onto every posting (8 bytes/row) so
  * serving needs no second per-term join; `<table>_stats` = one row
  * (n_docs, total_tokens). Scoring reuses
  * [[Retrieval.withBm25Cols]] VERBATIM, so for the same corpus and
  * parameters `query` returns exactly what the direct scan returns,
  * bit-for-bit (TextIndexSpec pins the equality).
  *
  * Stats (df, N, total tokens) are corpus-global, so there is no
  * cheap append: adding documents changes every term's idf. Rebuild
  * on ingest boundaries (the index build is one token-explode pass —
  * the same cost as a single direct query, amortized over every query
  * after it).
  */
object TextIndex {

  /** Persist postings + stats (overwrites both tables). The corpus
    * is tokenized twice — once for the one-row stats aggregate, once
    * for the postings — same trade as [[Retrieval.bm25TopK]]
    * (materializing the tokenized corpus to save a pass costs more
    * than the pass); the build price is paid once and amortized over
    * every query after it. `buckets` bounds the per-query read
    * fan-in; term-hash buckets stay balanced because no single term
    * dominates DISTINCT (term, doc) postings.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val T = graft.functions.TextFunctions
    val spark = corpus.sparkSession
    val toks = corpus.select(col(idCol).as("doc_id"),
      T.tokens(col(textCol)).as("__ts"))
    val posts = toks
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      // df rides the SAME term-keyed exchange the bucketed write
      // needs anyway — no extra corpus pass
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("__ts")).cast("long")).as("total_tokens"))
    Seq(table, s"${table}_stats")
      .foreach(Warehouse.dropManaged(spark, _))
    stats.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_stats")
    posts.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(table)
  }

  /** Top-`k` documents per query over the built index:
    * `(query_id, doc_id, score_micro, rank)` — identical to
    * [[Retrieval.bm25TopK]] on the indexed corpus. The query
    * vocabulary is collected (bounded by the query batch's distinct
    * terms — serving batches are small by contract) and pushed into
    * the scan filter, so bucket pruning skips every other term's
    * files.
    */
  def query(spark: SparkSession, table: String, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import spark.implicits._
    val T = graft.functions.TextFunctions
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(T.tokens(col(qtextCol)))).as("term"))
    val vocab = qterms.select("term").distinct()
      .as[String].collect().toSeq.sorted
    // an empty vocabulary leaves isin() ≡ false: the scan prunes to
    // nothing and the result is empty with the right schema
    val posts = spark.table(table)
      .filter(col("term").isin(vocab: _*)) // bucket-pruned scan
      .select(col("term"), col("doc_id").as("__doc"),
        col("tf").as("__tf"), col("dl").as("__dl"),
        col("df").as("__df"))
    val stats = spark.table(s"${table}_stats")
      .select(col("n_docs").as("__nd"),
        col("total_tokens").as("__tt"))
    val scored = Retrieval.withBm25Cols(
      posts.crossJoin(broadcast(stats)), k1Milli, bMilli)
    val perDoc = scored.join(broadcast(qterms), Seq("term"))
      .groupBy("__qid", "__doc")
      .agg(sum(col("__idf") * col("__tfw")).as("score_micro"))
    Retrieval.rankTopK(perDoc, k)
      .select(col("__qid").as(qidCol), col("__doc").as("doc_id"),
        col("score_micro"), col("rank"))
  }
}
