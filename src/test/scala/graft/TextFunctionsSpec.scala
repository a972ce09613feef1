package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    Seq("x").toDF("d").select(c).collect()(0).get(0).asInstanceOf[A]

  test("tokenCount") {
    val df = Seq("  the quick  brown fox ").toDF("t")
    assert(df.select(T.tokenCount(col("t"))).collect()(0).getInt(0) == 4)
  }

  test("charShingles produce len-n+1 shingles") {
    val df = Seq("abcdef").toDF("t")
    val sh = df.select(T.charShingles(col("t"), 3)).collect()(0)
      .getSeq[String](0)
    assert(sh == Seq("abc", "bcd", "cde", "def"))
  }

  test("wordNGrams") {
    val df = Seq("a b c d").toDF("t")
    val g = df.select(T.wordNGrams(col("t"), 2)).collect()(0)
      .getSeq[String](0)
    assert(g == Seq("a b", "b c", "c d"))
  }

  test("quality signals on clean vs junk text") {
    val clean = "The quick brown fox jumps over the lazy dog and then " +
      "it runs away to the forest with a big smile on its face today."
    val junk = "@@@@ #### $$$$ %%%% ^^^^ &&&&"
    val df = Seq((clean, junk)).toDF("clean", "junk")
    val r = df.select(
      T.qualityScore(col("clean")).as("qc"),
      T.qualityScore(col("junk")).as("qj"),
      T.stopwordRatio(col("clean")).as("sc")).collect()(0)
    assert(r.getDouble(0) > r.getDouble(1))
    assert(r.getDouble(2) > 0.2)
  }

  test("langId picks the dominant stopword language") {
    val df = Seq(
      ("the cat and the dog of the house", "en"),
      ("el gato y la casa de los perros que", "es"),
      ("der hund und die katze ist ein tier", "de"),
      ("12345 67890", "und")).toDF("t", "want")
    val got = df.select(T.langId(col("t")).as("l"), col("want"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (l, want) => assert(l == want, s"got $l want $want") }
  }

  test("fingerprint normalizes case and punctuation") {
    val df = Seq(("Hello, World!", "hello world", "other")).toDF("a", "b", "c")
    val r = df.select(T.fingerprint(col("a")).as("fa"),
      T.fingerprint(col("b")).as("fb"),
      T.fingerprint(col("c")).as("fc")).collect()(0)
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) != r.getString(2))
  }

  test("bpeishTokenCount splits letter/digit/punct transitions") {
    val df = Seq("abc123 def!").toDF("t")
    // abc | 123 | def | !
    assert(df.select(T.bpeishTokenCount(col("t"))).collect()(0)
      .getInt(0) == 4)
  }
}
