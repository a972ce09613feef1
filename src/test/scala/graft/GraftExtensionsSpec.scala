package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeHash

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    Seq(("the quick brown fox", Seq(0.25f, -0.5f)))
      .toDF("text", "vec").createOrReplaceTempView("ext_in")
    val viaSql = spark.sql(
      """SELECT graft_simhash(text) AS sh,
         graft_minhash(text, 16, 5, 42) AS mh,
         graft_ngrams(text, 2) AS ng,
         graft_dot_q(graft_quantize(vec), graft_quantize(vec)) AS d
         FROM ext_in""").collect()(0)
    val viaCols = spark.table("ext_in").select(
      NativeHash.simhashColumn(col("text")).as("sh"),
      NativeHash.minhashColumn(col("text"), 16, 5).as("mh"),
      NativeHash.distinctWordNGramsColumn(col("text"), 2).as("ng"),
      graft.operators.Similarity.dotQ(
        graft.operators.Similarity.quantize(col("vec")),
        graft.operators.Similarity.quantize(col("vec"))).as("d"))
      .collect()(0)
    assert(viaSql.getLong(0) == viaCols.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCols.getSeq[Long](1))
    assert(viaSql.getSeq[String](2) == viaCols.getSeq[String](2))
    assert(viaSql.getLong(3) == viaCols.getLong(3))
  }

  test("text-curation SQL functions match the Column API") {
    import graft.functions.{TextFunctions => T}
    GraftFunctions.register(spark)
    Seq("the cat and the cat sat\nthe cat and the cat sat\nunique")
      .toDF("text").createOrReplaceTempView("ext_txt")
    val viaSql = spark.sql(
      """SELECT graft_stopword_ratio(lower(text)) AS sr,
         graft_lang_id(lower(text)) AS li,
         graft_dup_line_stats(text).dup_line_frac AS dlf,
         graft_dup_line_stats(text).dup_char_frac AS dcf,
         graft_repeated_ngram_frac(text, 2) AS rnf
         FROM ext_txt""").collect()(0)
    val viaCols = spark.table("ext_txt").select(
      T.stopwordRatio(col("text")).as("sr"),
      T.langId(col("text")).as("li"),
      T.duplicateLineFraction(col("text")).as("dlf"),
      T.duplicateLineCharFraction(col("text")).as("dcf"),
      T.topBigramCharFraction(col("text")).as("rnf")).collect()(0)
    assert(viaSql.getDouble(0) == viaCols.getDouble(0))
    assert(viaSql.getString(1) == viaCols.getString(1))
    assert(viaSql.getDouble(2) == viaCols.getDouble(2))
    assert(viaSql.getDouble(3) == viaCols.getDouble(3))
    assert(viaSql.getDouble(4) == viaCols.getDouble(4))
  }

  test("graft_redact_ibans SQL function matches the Column API") {
    import graft.functions.{TextFunctions => T}
    GraftFunctions.register(spark)
    Seq("acct GB29 NWBK 6016 1331 9268 19 REF7 eom",
      "near DE89370400440532013001 kept")
      .toDF("text").createOrReplaceTempView("ext_iban")
    val viaSql = spark.sql(
      "SELECT graft_redact_ibans(text) AS c FROM ext_iban")
      .as[String].collect().toSeq
    val viaCols = spark.table("ext_iban")
      .select(T.redactIbans(col("text")).as("c"))
      .as[String].collect().toSeq
    assert(viaSql == viaCols)
    assert(viaSql(0) == "acct <IBAN> REF7 eom")
    assert(viaSql(1) == "near DE89370400440532013001 kept")
  }

  test("HTML SQL functions match the Column API") {
    import graft.functions.{TextFunctions => T}
    GraftFunctions.register(spark)
    Seq("<html><head><title>T</title><script>no()</script></head>" +
        "<body><p>Hi &amp; bye</p><a href=\"https://x.com/1\">l</a>" +
        "</body></html>")
      .toDF("h").createOrReplaceTempView("ext_html")
    val viaSql = spark.sql(
      """SELECT graft_html_text(h) AS t, graft_html_title(h) AS ti,
         graft_html_links(h) AS ls FROM ext_html""").collect()(0)
    val viaCols = spark.table("ext_html").select(
      T.htmlToText(col("h")).as("t"), T.htmlTitle(col("h")).as("ti"),
      T.htmlLinks(col("h")).as("ls")).collect()(0)
    assert(viaSql.getString(0) == viaCols.getString(0))
    assert(viaSql.getString(0) == "T Hi & bye l")
    assert(viaSql.getString(1) == "T")
    assert(viaSql.getSeq[String](2) == Seq("https://x.com/1"))
    assert(viaSql.getSeq[String](2) == viaCols.getSeq[String](2))
  }

  test("graft_hash_vector and graft_script_count match the Column " +
      "API") {
    import graft.functions.{TextFunctions => T}
    GraftFunctions.register(spark)
    Seq("the quick brown fox", "Привет мир")
      .toDF("t").createOrReplaceTempView("ext_hv")
    val viaSql = spark.sql(
      """SELECT graft_hash_vector(t, 32) AS v,
         graft_script_count(t, 'cyrillic') AS cy FROM ext_hv""")
      .collect()
    val viaCols = spark.table("ext_hv").select(
      T.hashingVector(col("t"), 32).as("v"),
      T.scriptCount(col("t"), "cyrillic").as("cy")).collect()
    viaSql.zip(viaCols).foreach { case (a, b) =>
      assert(a.getSeq[Long](0) == b.getSeq[Long](0))
      assert(a.getInt(1) == b.getInt(1))
    }
    assert(viaSql(1).getInt(1) == 9) // 'Привет мир' minus the space
    intercept[Exception] {
      spark.sql("SELECT graft_script_count('x', 'klingon')").collect()
    }
  }

  test("extensions path installs the same functions at session build") {
    // same JVM/context: a fresh session built with extensions
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the existing session — register covers it;
    // either way the function must resolve
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT graft_simhash('a b c')").collect()(0)
      .getLong(0) == spark.sql("SELECT graft_simhash('a b c')")
      .collect()(0).getLong(0))
  }
}
