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

  test("Quantize/DotQ/HyperplaneBits equal their expression trees") {
    import graft.operators.Similarity
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding")).limit(200)
    val treeQuant = transform(col("embedding"),
      x => round(x.cast("double") * 1000, 0).cast("long"))
    val treeDot = aggregate(
      zip_with(col("nq"), col("nq"), (x, y) => x * y), lit(0L), _ + _)
    val treeBits = (0 until 8).map { p =>
      val w = array((0 until 64).map(j =>
        lit(Similarity.planeComponent(3 + p, j))): _*)
      when(aggregate(zip_with(col("nq"), w, (x, ww) => x * ww),
        lit(0L), _ + _) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val staged = emb
      .withColumn("nq", Similarity.quantize(col("embedding")))
      .withColumn("tq", treeQuant)
    val bad = staged
      .withColumn("nd", graft.functions.NativeHash
        .dotQColumn(col("nq"), col("nq")))
      .withColumn("td", treeDot)
      .withColumn("nb", Similarity.hyperplaneBucketQ(col("nq"), 64, 8, 3))
      .withColumn("tb", treeBits)
      .filter(not(col("nq") === col("tq")) ||
        not(col("nd") === col("td")) || not(col("nb") === col("tb")))
      .count()
    assert(bad == 0)
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

  test("StopwordRatio kernel equals the expression-tree ratio") {
    import graft.functions.{TextFunctions => T}
    val extra = Seq("the and of to", "THE The tHe", "el la de que y",
      "word", "the").toDF("text")
    for (df <- Seq(tricky, extra, docs)) {
      val both = df.select(
        T.stopwordRatio(col("text")).as("native"),
        T.stopwordRatioTree(col("text")).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0)
    }
  }

  test("LangIdArgmax kernel equals the expression-tree argmax") {
    import graft.functions.{TextFunctions => T}
    val extra = Seq("the and of to in is", "el la de que y en",
      "der die und das nicht", "le la les des est et",
      "\u7684 \u662f \u4e86 \u5728", "no markers here at all xyz",
      "the el", "el the", "").toDF("text")
    for (df <- Seq(tricky, extra, docs)) {
      val both = df.select(
        T.langId(col("text")).as("native"),
        T.langIdTree(col("text")).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0)
    }
  }
}
