package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document → training-chunk explosion: long documents become
  * fixed-token-budget windows with optional overlap — the step between
  * a curated corpus and a tokenizer's input. Pure per-row expression
  * work (split + sequence + slice + explode): no shuffle, scan-scale,
  * and the row expansion is bounded by tokens/stride per doc.
  */
object Chunking {

  /** Split each document's whitespace tokens into windows of
    * `maxTokens` advancing by `maxTokens - overlap`. Every token is
    * covered; the final window may be shorter; a document shorter than
    * `maxTokens` yields exactly itself as chunk 0. Output: idCol,
    * `chunk_id` (0-based), `chunk_text`, `chunk_tokens`.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    // null text yields no chunks (without the filter, size(null) = -1
    // arithmetic would fabricate one garbage window per null doc)
    val df0 = df.filter(col(textCol).isNotNull)
    val ts = split(trim(col(textCol)), "\\s+")
    val n  = size(ts)
    // number of windows: 1 + ceil(max(n - maxTokens, 0) / stride)
    val extra  = greatest(n - lit(maxTokens), lit(0))
    val nChunk = lit(1) + ceil(extra.cast("double") / lit(stride))
      .cast("int")
    df0.select(col(idCol), posexplode(transform(
        sequence(lit(0), nChunk - lit(1)),
        i => slice(ts, i * lit(stride) + lit(1), lit(maxTokens))))
        .as(Seq("chunk_id", "__toks")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__toks")).as("chunk_text"),
        size(col("__toks")).as("chunk_tokens"))
  }

  /** Greedy contiguous sequence packing: assign chunks to training
    * packs of ~`budgetTokens`, deterministically. Chunks are ordered by
    * (`idCol`, `orderCol`) within `nShards` hash shards and filled
    * contiguously: a chunk starts a new pack when the running total
    * before it has crossed the budget, so a pack exceeds the budget by
    * at most one chunk — `budgetTokens + maxChunkTokens` is the hard
    * bound (no chunk is ever split).
    *
    * Shard-parallelism is the scale design: a single global running sum
    * would be one partition over every chunk in the corpus; sharding by
    * id hash keeps the window parallel while staying deterministic on
    * any partitioning (the shard and the in-shard order are both pure
    * functions of the data). Output adds `shard` and `pack_id`
    * (unique within shard).
    */
  def packChunks(df: DataFrame, idCol: String, orderCol: String,
      tokenCol: String, budgetTokens: Int,
      nShards: Int = 256): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    // md5-keyed shard (not Murmur3 `hash`): engine-portable like every
    // other deterministic key in the library
    val shard = pmod(graft.functions.HashFunctions
      .stableHash60(col(idCol).cast("string")), lit(nShards))
    val w = Window.partitionBy("shard")
      .orderBy(col(idCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)).cast("double") /
          lit(budgetTokens)))
      .drop("__cum")
  }
}
