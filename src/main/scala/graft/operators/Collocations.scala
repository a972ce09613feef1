package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation / phrase mining: rank adjacent word pairs by LIFT —
  * how much more often the pair occurs than its words' frequencies
  * predict. The curation uses: glossary/entity extraction ("new york",
  * "machine learning"), tokenizer-merge candidates, and template-spam
  * signatures (boilerplate bigrams score absurd lifts).
  *
  * Scoring avoids logs (PMI's cross-libm ln is not engine-portable):
  * for a fixed corpus, PMI ordering == lift ordering == the ratio
  * c_xy / (c_x · c_y), so the score is that ratio scaled by 10¹² —
  * exact integer counts converted to double ONCE each (value-exact
  * under 2⁵³) through one fixed shape of IEEE ops, the same
  * discipline as the correlation matrix (SURVEY C71).
  *
  * 100 TB shape: both counting passes are map-side-combined
  * aggregations (stopword hub pairs are absorbed in partials); the
  * `minCount` floor prunes the pair table BEFORE the two token-keyed
  * joins against the unigram table; the final top-k is a
  * TakeOrdered, never a global sort.
  */
object Collocations {

  /** Whitespace token stream — the same trim + `\s+` discipline as
    * the hashing/simhash surfaces, so count semantics line up across
    * the text operators.
    */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Top-`topK` adjacent pairs with `pair_count >= minCount`, ranked
    * by lift (desc, then w1/w2 asc — a total order, so the limit is
    * deterministic). Output: (w1, w2, pair_count, c1, c2,
    * lift_score = pair_count·10¹² / (c1·c2)).
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
      topK: Int = 100): DataFrame = {
    val arr = toks(col(textCol))
    val n = size(arr)
    val bigrams = when(n >= 2,
      zip_with(slice(arr, lit(1), n - 1), slice(arr, lit(2), n - 1),
        (x, y) => struct(x.as("w1"), y.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val pairCounts = df.select(explode(bigrams).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val uni = df.select(explode(arr).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val scored = pairCounts
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .withColumn("lift_score",
        col("pair_count").cast("double") * lit(1e12) /
          (col("c1").cast("double") * col("c2").cast("double")))
    scored.select("w1", "w2", "pair_count", "c1", "c2", "lift_score")
      .orderBy(col("lift_score").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
