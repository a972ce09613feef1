package graft

import org.apache.spark.sql.SparkSession

/** Fixture generator: writes five single-file parquet fixtures
  * with Spark's parquet-mr — THE reference implementation — across
  * codecs, schemas and row-group configurations, into
  * `src/test/resources/parquet/fx{0..4}.parquet`. PqSpec then
  * cross-checks [[graft.operators.ParquetMeta.parquetMeta]]
  * against what `spark.read.parquet` itself reports on the same
  * committed bytes.
  *
  * Usage: sbt "Test/runMain graft.PqFixtureGen"
  */
object PqFixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("pq-fixture-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val outDir = java.nio.file.Paths.get(
      "src/main/resources/parquet")
    java.nio.file.Files.createDirectories(outDir)

    // optional arg: regenerate just one fixture index (committed
    // fixtures are reference output — avoid churning the others)
    val onlyIdx: Option[Int] = args.headOption.map(_.toInt)

    def writeOne(df: org.apache.spark.sql.DataFrame, codec: String,
        blockSize: Option[Int], idx: Int,
        extra: Map[String, String] = Map.empty): Unit = {
      if (onlyIdx.exists(_ != idx)) return
      val tmp = java.nio.file.Files.createTempDirectory("pqfx")
        .toString
      var w = df.coalesce(1).write.mode("overwrite")
        .option("compression", codec)
      blockSize.foreach(bs =>
        w = w.option("parquet.block.size", bs.toString))
      extra.foreach { case (k, v) => w = w.option(k, v) }
      w.parquet(tmp)
      val part = java.nio.file.Files.list(
        java.nio.file.Paths.get(tmp)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part,
        outDir.resolve(s"fx$idx.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    writeOne((0L until 100L).map(i => (i, s"name-$i"))
      .toDF("id", "name"), "uncompressed", None, 0)
    writeOne((0L until 250L).map(i => (i, i * 0.5, s"s$i"))
      .toDF("id", "v", "s"), "snappy", None, 1)
    writeOne((0L until 50L).map(i =>
        (i, (i * 2, s"b$i"), Seq(i, i + 1)))
      .toDF("id", "info", "arr"), "gzip", None, 2)
    // a tiny block size forces multiple row groups
    writeOne((0L until 20000L).map(i => (i, s"pad-$i-padpadpad"))
      .toDF("id", "txt"), "zstd", Some(4096), 3)
    writeOne((0L until 300L).map(i => (i, i % 7))
      .toDF("id", "grp"), "lz4", None, 4)

    // fx5: the BLOOM fixture — split-block bloom filters on both
    // columns (parquet-mr's own writer, the reference bloom
    // implementation), 5000 distinct values each so membership
    // probes are meaningful
    writeOne((0L until 5000L).map(i => (i, s"v$i"))
      .toDF("id", "s"), "snappy", None, 5, Map(
        "parquet.bloom.filter.enabled#id" -> "true",
        "parquet.bloom.filter.enabled#s" -> "true",
        "parquet.bloom.filter.expected.ndv#id" -> "5000",
        "parquet.bloom.filter.expected.ndv#s" -> "5000"))

    // fx7: the NULLABLE low-cardinality string fixture — 400 rows
    // where every 7th tag is NULL (definition levels on the wire)
    // and the 5 distinct values force dictionary encoding; ids
    // planted 0..399 so every fact is closed-form
    {
      import org.apache.spark.sql.functions.{col, expr}
      val df = spark.range(0, 400).toDF("id")
        .withColumn("tag", expr(
          "CASE WHEN id % 7 = 0 THEN CAST(NULL AS STRING) " +
          "ELSE concat('t', CAST(id % 5 AS STRING)) END"))
      writeOne(df, "snappy", None, 7)
    }

    // fx6: the PAGE-INDEX fixture — 5000 sorted rows forced into
    // exact 1000-row pages (parquet.page.row.count.limit), one row
    // group, so every page's ColumnIndex [min,max] and the
    // OffsetIndex first_row_index are known closed-form: page k
    // covers ids [1000k, 1000k+999]
    writeOne((0L until 5000L).map(i => (i, s"v$i"))
      .toDF("id", "s"), "snappy", None, 6, Map(
        "parquet.page.row.count.limit" -> "1000"))

    // fx8/fx9/fx10: the TYPED matrix (round 19) — one planted
    // 3000-row table cycling every flat physical type a Spark
    // table carries (bool/int32/int64/float/double/byte_array/
    // FLBA-decimal/date/timestamp, REQUIRED and OPTIONAL both),
    // written three ways by the reference writer so every
    // (type × encoding × page-version) cell has committed bytes:
    //   fx8  = v1 pages, dictionary on, snappy
    //   fx9  = v2 pages, dictionary OFF → the delta encodings
    //          (DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY / RLE
    //          booleans), zstd
    //   fx10 = v1 pages, dictionary OFF → PLAIN everything,
    //          uncompressed
    // Every value is closed-form in id so the DuckDB oracle
    // replays probes exactly.
    {
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      val typed = spark.range(0, 3000).toDF("id")
        .withColumn("i32", (col("id") % 1000).cast("int"))
        .withColumn("i32n", when(col("id") % 7 === 0, lit(null))
          .otherwise((col("id") % 1000) - 500).cast("int"))
        .withColumn("d", col("id") * 0.25)
        .withColumn("f", ((col("id") % 64) * 0.5).cast("float"))
        .withColumn("fn", when(col("id") % 11 === 0, lit(null))
          .otherwise((col("id") % 32) * 0.25).cast("float"))
        .withColumn("bl", col("id") % 3 === 0)
        .withColumn("bln", when(col("id") % 5 === 0, lit(null))
          .otherwise(col("id") % 2 === 1))
        .withColumn("s", concat(lit("x"), col("id")))
        .withColumn("sn", when(col("id") % 13 === 0, lit(null))
          .otherwise(concat(lit("t"), col("id") % 17)))
        .withColumn("dec9", (col("id") % 9999).cast("decimal(9,2)"))
        .withColumn("dec18",
          (col("id") % 123457).cast("decimal(18,3)"))
        .withColumn("dec25", col("id").cast("decimal(25,4)"))
        .withColumn("dt", date_add(to_date(lit("2020-01-01")),
          (col("id") % 700).cast("int")))
        .withColumn("ts", timestamp_micros(
          lit(1600000000000000L) + col("id") * 1000))
      writeOne(typed, "snappy", None, 8)
      writeOne(typed, "zstd", None, 9, Map(
        "parquet.writer.version" -> "PARQUET_2_0",
        "parquet.enable.dictionary" -> "false"))
      writeOne(typed, "uncompressed", None, 10, Map(
        "parquet.enable.dictionary" -> "false"))
    }

    spark.stop()
    println(s"wrote $outDir")
  }
}
