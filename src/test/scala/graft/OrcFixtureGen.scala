package graft

import org.apache.spark.sql.SparkSession

/** Fixture generator: writes five single-file ORC fixtures with
  * Spark's own ORC writer — the reference implementation on this
  * classpath — across codecs and schemas, into
  * `src/main/resources/orc/fx{0..4}.orc`. OrcSpec then cross-checks
  * [[graft.operators.Orc.orcMeta]] against what `spark.read.orc`
  * itself reports on the same committed bytes.
  *
  * Usage: sbt "Test/runMain graft.OrcFixtureGen"
  */
object OrcFixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("orc-fixture-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val outDir = java.nio.file.Paths.get("src/main/resources/orc")
    java.nio.file.Files.createDirectories(outDir)

    // optional arg: regenerate just one fixture index (committed
    // fixtures are reference output — avoid churning the others)
    val onlyIdx: Option[Int] = args.headOption.map(_.toInt)

    def writeOne(df: org.apache.spark.sql.DataFrame, codec: String,
        idx: Int, stripeSize: Option[Long] = None): Unit = {
      if (onlyIdx.exists(_ != idx)) return
      val tmp = java.nio.file.Files.createTempDirectory("orcfx")
        .toString
      var w = df.coalesce(1).write.mode("overwrite")
        .option("compression", codec)
      stripeSize.foreach(ss =>
        w = w.option("orc.stripe.size", ss.toString))
      w.orc(tmp)
      val part = java.nio.file.Files.list(
        java.nio.file.Paths.get(tmp)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".orc")).get
      java.nio.file.Files.copy(part,
        outDir.resolve(s"fx$idx.orc"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    writeOne((0L until 100L).map(i => (i, s"name-$i"))
      .toDF("id", "name"), "none", 0)
    writeOne((0L until 250L).map(i => (i, i * 0.5, s"s$i"))
      .toDF("id", "v", "s"), "zlib", 1)
    writeOne((0L until 50L).map(i =>
        (i, (i * 2, s"b$i"), Seq(i, i + 1)))
      .toDF("id", "info", "arr"), "snappy", 2)
    // a tiny stripe size forces multiple stripes
    writeOne((0L until 20000L).map(i => (i, s"pad-$i-padpadpad"))
      .toDF("id", "txt"), "zstd", 3, Some(65536L))
    writeOne((0L until 300L).map(i => (i, i % 7 == 0, i.toShort))
      .toDF("id", "flag", "sm"), "lz4", 4)

    // fx5: the STATS fixture — 5000 sorted rows forced into small
    // stripes (orc.stripe.row.count=1000, which the writer rounds
    // UP to its 1024-row vector batches; scoped to THIS write so
    // re-running the gen never re-stripes fx0-4) so every stripe's
    // [min,max] is known closed-form: stripe k covers
    // [1024k, min(1024k+1023, 4999)]; s cycles s0..s9 (min "s0",
    // max "s9", total length 10000)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("orc.stripe.row.count", "1000")
    try writeOne((0L until 5000L).map(i => (i, s"s${i % 10}"))
      .toDF("id", "s"), "zlib", 5)
    finally hc.unset("orc.stripe.row.count")

    // fx6: the BLOOM fixture — 5000 sorted rows, ONE stripe, row
    // index stride 1000 (exact, unlike stripe.row.count's 1024
    // rounding) → 5 row groups, each with its own BloomFilterUtf8
    // on BOTH columns (id long → Thomas-Wang hash; s string →
    // Murmur3 hash64 of the UTF-8 bytes). Uncompressed so the
    // committed stream bytes are the writer's own, unwrapped.
    hc.set("orc.bloom.filter.columns", "id,s")
    hc.set("orc.row.index.stride", "1000")
    try writeOne((0L until 5000L).map(i => (i, s"v$i"))
      .toDF("id", "s"), "none", 6)
    finally {
      hc.unset("orc.bloom.filter.columns")
      hc.unset("orc.row.index.stride")
    }

    // fx7: the NULLABLE fixture (round 19 — present streams on the
    // wire): 400 rows where every 7th tag is NULL (5 distinct
    // values force dictionary), every 11th dbl is NULL; ids
    // planted 0..399 so every fact is closed-form
    {
      import org.apache.spark.sql.functions.{col, expr}
      val df = spark.range(0, 400).toDF("id")
        .withColumn("tag", expr(
          "CASE WHEN id % 7 = 0 THEN CAST(NULL AS STRING) " +
          "ELSE concat('t', CAST(id % 5 AS STRING)) END"))
        .withColumn("dbl", expr(
          "CASE WHEN id % 11 = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE id * 0.25 END"))
      writeOne(df, "snappy", 7)
    }

    spark.stop()
    println(s"wrote $outDir")
  }
}
