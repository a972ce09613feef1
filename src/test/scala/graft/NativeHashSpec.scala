package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeHash
import graft.operators.Dedup

/** The native kernels must be BIT-IDENTICAL to the composed expression
  * trees (which the DuckDB oracles mirror). Checked on real documents
  * plus adversarial strings.
  */
class NativeHashSpec extends SparkSpec {
  import spark.implicits._

  private val tricky = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "   ", "a", "ab", "abcd", "abcde",
    "multi   space\ttab and\nnewline",
    "unicode: héllo wörld ñandú 中文 текст",
    "exactly5!", "trailing space ",
    " leading", "punct.,;:!?()[]{}").toDF("text")

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("text")).limit(200)

  test("ShingleMinHash equals the expression-tree signature") {
    for (df <- Seq(tricky, docs)) {
      val both = df.select(
        NativeHash.minhashColumn(col("text"), 16, 5).as("native"),
        Dedup.minhashSignature(col("text"), 16, 5).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0)
    }
  }

  test("DistinctWordNGrams equals array_distinct(wordNGrams)") {
    import graft.functions.{TextFunctions => T}
    for (df <- Seq(tricky, docs)) {
      val both = df.select(
        NativeHash.distinctWordNGramsColumn(col("text"), 3).as("native"),
        array_distinct(T.wordNGrams(col("text"), 3)).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0)
    }
  }

  test("TokenSimHash equals the expression-tree simhash") {
    for (df <- Seq(tricky, docs)) {
      val both = df.select(
        NativeHash.simhashColumn(col("text")).as("native"),
        Dedup.simhash(col("text")).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0)
    }
  }
}
