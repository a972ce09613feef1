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

  test("WordGramHashes equals stableHash60 over wordNGrams") {
    import graft.functions.{HashFunctions => H, TextFunctions => T}
    for (df <- Seq(tricky, docs); n <- Seq(2, 8)) {
      val both = df.select(
        NativeHash.wordGramHashesColumn(col("text"), n).as("native"),
        transform(T.wordNGrams(col("text"), n),
          g => H.stableHash60(g)).as("tree"))
      val bad = both.filter(not(col("native") === col("tree"))).count()
      assert(bad == 0, s"n=$n")
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

  test("DupLineStats kernel equals the line-fraction trees") {
    import graft.functions.{TextFunctions => T}
    val extra = Seq("a\nb\na\nc", "x", "", "\n\n", "a\na\na",
      "one line\ntwo line\none line\n", "é\né\nz").toDF("text")
    for (df <- Seq(tricky, extra, docs)) {
      val both = df.select(
        T.duplicateLineFraction(col("text")).as("n1"),
        T.duplicateLineFractionTree(col("text")).as("t1"),
        T.duplicateLineCharFraction(col("text")).as("n2"),
        T.duplicateLineCharFractionTree(col("text")).as("t2"))
      val bad = both.filter(
        not(col("n1") === col("t1")) or not(col("n2") === col("t2")))
        .count()
      assert(bad == 0)
    }
  }

  test("RepeatedNGramCharFrac kernel equals the bigram tree") {
    import graft.functions.{TextFunctions => T}
    val extra = Seq("x y x y x y a b c", "a", "", "  ", "a b",
      "a b a b", "w1 w2 w3 w1 w2", "é z é z").toDF("text")
    for (df <- Seq(tricky, extra, docs)) {
      val both = df.select(
        T.topBigramCharFraction(col("text")).as("native"),
        T.topBigramCharFractionTree(col("text")).as("tree"))
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

  test("VecSumLong equals per-dim sums; nulls skipped; empty -> null") {
    import spark.implicits._
    import graft.functions.NativeHash
    val df = Seq(
      (0, Some(Seq(1L, 2L, 3L))),
      (0, None),
      (0, Some(Seq(10L, 20L, 30L))),
      (1, Some(Seq(5L, 5L, 5L)))
    ).toDF("g", "v").repartition(8) // exercise partial merge + serde
    val got = df.groupBy("g")
      .agg(NativeHash.vecSumColumn(col("v")).as("s"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(0) == Seq(11L, 22L, 33L))
    assert(got(1) == Seq(5L, 5L, 5L))
    // all-null group yields null, not a zero vector
    val empty = Seq((0, Option.empty[Seq[Long]]))
      .toDF("g", "v").groupBy("g")
      .agg(NativeHash.vecSumColumn(col("v")).as("s"))
      .select("s").collect()(0)
    assert(empty.isNullAt(0))
    // ragged lengths fail loudly
    val ragged = Seq((0, Seq(1L)), (0, Seq(1L, 2L))).toDF("g", "v")
    intercept[Exception] {
      ragged.groupBy("g").agg(NativeHash.vecSumColumn(col("v")))
        .collect()
    }
    // all-EMPTY arrays: an empty-array result, distinguishable from
    // the all-null group's null
    val allEmpty = Seq((0, Seq.empty[Long]), (0, Seq.empty[Long]))
      .toDF("g", "v").groupBy("g")
      .agg(NativeHash.vecSumColumn(col("v")).as("s"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(allEmpty(0) == Seq.empty[Long])
    // an empty array mixed with sized rows is ragged, not a no-op
    val mixed = Seq((0, Seq.empty[Long]), (0, Seq(1L, 2L)))
      .toDF("g", "v").coalesce(1)
    intercept[Exception] {
      mixed.groupBy("g").agg(NativeHash.vecSumColumn(col("v")))
        .collect()
    }
  }
}
