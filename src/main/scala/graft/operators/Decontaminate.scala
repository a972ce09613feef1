package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
