package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming CRAWL-ingest throughput harness (diagnostic main, not
  * part of the bench): rate-source synthetic documents are wrapped
  * into REAL WARC request/response payloads (every 2nd gzipped, the
  * .warc.gz member layout) and streamed through
  * [[graft.streaming.StreamingOps.crawlIngest]] — unwrap → quality
  * gate → near-dup increment → index append — against a standing
  * sf0.1 band index. This prices the full ingest composition, not
  * just the dedup step: the deltas vs `StreamThroughput` are the
  * WARC/gzip unwrap and the quality filter, both map-only.
  *
  * Text construction: vocabulary drawn from the corpus (shingle
  * overlap with the standing index), per-word seed-derived suffix
  * TRANSLATED to letters (hex digits would trip the digit-ratio
  * quality rule), a trailing stopword so the stopword rule passes,
  * and 1-in-16 planted near-copies so true pairs exist. Every
  * synthetic doc passes the quality gate by construction — the gate
  * still runs at full cost; a kept-fraction printout guards against
  * accidentally measuring the drop path.
  *
  * Usage: `sbt "runMain graft.CrawlThroughput"`. Env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_STREAM_SECS (default 24),
  * SPARK_GRAFT_STREAM_RPS (default 2000), SPARK_GRAFT_CPUS.
  */
object CrawlThroughput {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val runSecs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "24")
      .toInt
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "2000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table = "graft_crawl_tp_idx"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.operators.BandIndex.build(docs, "doc_id", "text", table)
    val baseRows = spark.table(table).count()
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L

    val vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 2)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(64).select("w").as[String].collect()
    val vocabLit = array(vocab.map(lit(_)): _*)

    // same planted-copy scheme as StreamThroughput, but the suffix is
    // letter-translated so the quality gate's digit/upper rules pass
    val seed = pmod(when(pmod(col("value"), lit(16)) === 1,
      col("value") - 1).otherwise(col("value")), lit(999983L))
    val words = (0 until 20).map { i =>
      val h = pmod(seed * lit(2654435761L) +
        lit(i.toLong * 1099511628211L), lit(999983L))
      concat(
        element_at(vocabLit,
          (pmod(h, lit(vocab.length.toLong)) + 1).cast("int")),
        translate(lower(hex(pmod(h * lit(40503L) + seed,
          lit(1048573L)))),
          "0123456789abcdef", "ghijklmnopqrstuv"))
    }
    val textCol = concat_ws(" ",
      (words :+ lit("the")): _*) // trailing stopword for the gate
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select((col("value") + maxId).as("doc_id"),
        textCol.as("__t"),
        pmod(col("value"), lit(2)).cast("int").as("__gz"))
    val warcs = graft.operators.Archive.synthWarcs(stream, "doc_id",
      "__t", "__gz", "content")
      .select("doc_id", "content")

    case class Epoch(id: Long, docs: Long, ms: Long, idxRows: Long)
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Epoch]
    val pairs = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) epochs.synchronized {
          val r = spark.table(table)
            .agg(count(lit(1)), count_distinct(
              when(col("id") >= maxId, col("id")))).head()
          epochs += Epoch(p.batchId, r.getLong(1),
            p.durationMs.values().stream().mapToLong(_.longValue)
              .sum(),
            r.getLong(0))
        }
      }
    })

    val q = graft.streaming.StreamingOps.crawlIngest(spark, table,
        warcs, "doc_id", "content") { (pairFrame, _) =>
      pairs.addAndGet(pairFrame.count())
      ()
    }
    val t0 = System.nanoTime()
    Thread.sleep(runSecs * 1000L)
    q.stop(); q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val snap = epochs.synchronized(epochs.toVector)
    println(f"${"epoch"}%6s ${"docs"}%8s ${"batch_ms"}%9s " +
      f"${"docs_per_s"}%10s ${"index_rows"}%11s ${"rows_added"}%10s")
    var prevRows = baseRows
    var prevDocs = 0L
    snap.foreach { ep =>
      val d = ep.docs - prevDocs
      println(f"${ep.id}%6d $d%8d ${ep.ms}%9d " +
        f"${d * 1000.0 / math.max(ep.ms, 1)}%10.0f " +
        f"${ep.idxRows}%11d ${ep.idxRows - prevRows}%10d")
      prevRows = ep.idxRows; prevDocs = ep.docs
    }
    val totalDocs = snap.lastOption.map(_.docs).getOrElse(0L)
    val bandsPerDoc =
      (snap.lastOption.map(_.idxRows).getOrElse(baseRows) - baseRows)
        .toDouble / math.max(totalDocs, 1L)
    println(f"TOTAL docs=$totalDocs epochs=${snap.size} " +
      f"wall=$wall%.1fs sustained=${totalDocs / wall}%.0f docs/s " +
      f"pairs=${pairs.get} index_rows_per_doc=$bandsPerDoc%.2f")
    require(snap.size >= 3, s"wanted >=3 epochs, got ${snap.size}")
    // every synthetic doc must survive the quality gate — otherwise
    // this harness silently measures the drop path, not ingest
    require(math.abs(bandsPerDoc - 4.0) < 0.01,
      s"kept-fraction slipped: $bandsPerDoc index rows/doc (want 4)")
    require(pairs.get() > 0, "planted near-copies must pair")
    spark.stop()
  }
}
