package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Streaming near-dup ingest throughput harness (diagnostic main, not
  * part of the bench): builds a band index over the sf0.1 documents
  * corpus, then streams RATE-SOURCE synthetic documents through
  * [[graft.streaming.StreamingOps.neardupIngest]] for several epochs,
  * reporting per-epoch docs, wall, docs/s and the index's row growth.
  *
  * The synthetic text draws words from the CORPUS's own vocabulary
  * (collected once, driver-side, bounded) so batch band keys overlap
  * the standing index the way a real crawl's would — an ingest joining
  * against foreign keys would measure nothing but the miss path.
  *
  * State sizing (the number to capacity-plan with): the index grows by
  * exactly `bands` rows per ACCEPTED document — independent of epoch
  * count or batch sizing — each row holding (band key string ~8-16 B,
  * id 8 B, signature k×8 B). At the k=16/bands=4 defaults that is
  *   bytes/doc ≈ 4 × (16 + 8 + 128) ≈ 600 B
  * before parquet encoding (dictionary + RLE compress the band keys
  * heavily; measured on-disk is ~⅓ of that). A year of 10M docs/day
  * is ~2.2 TB raw — a small parquet table, and the bucketed layout
  * keeps every increment's join shuffle-free no matter how big it
  * gets. The stats sidecar adds one (band, cnt) row per DISTINCT band
  * key per appended batch — readers SUM per key; compact on rebuild.
  *
  * Usage: `sbt "runMain graft.StreamThroughput"`. Env:
  * SPARK_GRAFT_SF_DIR (corpus dir), SPARK_GRAFT_STREAM_SECS (run
  * length, default 24), SPARK_GRAFT_STREAM_RPS (rate rows/s, default
  * 2000).
  */
object StreamThroughput {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val runSecs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "24").toInt
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

    val table = "graft_stream_tp_idx"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.operators.BandIndex.build(docs, "doc_id", "text", table)
    val baseRows = spark.table(table).count()
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L

    // corpus vocabulary, bounded: the synthetic stream speaks the same
    // shingle language as the standing index
    val vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 2)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(64).select("w").as[String].collect()
    val vocabLit = array(vocab.map(lit(_)): _*)

    // 20-word synthetic docs. Two constructions measured and rejected:
    // a plain `value mod |vocab|` word pick cycles every 64 values
    // (every 64th doc an exact copy — 159× the intended pairs, 21 s
    // batches), and UNsuffixed draws from a 64-word vocabulary leave
    // random cross-doc char-shingle Jaccard near the 0.5 threshold
    // (217k pairs from 2k docs). So each word carries a seed-derived
    // hex suffix: distinct docs share almost no 5-char shingles, and
    // the only collisions left are the PLANTED ones — one doc in 16 is
    // an exact near-copy of its predecessor (same `seed`, so suffixes
    // match too).
    val seed = pmod(when(pmod(col("value"), lit(16)) === 1,
      col("value") - 1).otherwise(col("value")), lit(999983L))
    val words = (0 until 20).map { i =>
      val h = pmod(seed * lit(2654435761L) +
        lit(i.toLong * 1099511628211L), lit(999983L))
      concat(
        element_at(vocabLit,
          (pmod(h, lit(vocab.length.toLong)) + 1).cast("int")),
        hex(pmod(h * lit(40503L) + seed, lit(1048573L))))
    }
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select((col("value") + maxId).as("doc_id"),
        concat_ws(" ", words: _*).as("text"))

    // per-epoch progress via the listener; docs and rows are measured
    // FROM THE INDEX (distinct appended ids / appended rows — the
    // progress event fires after foreachBatch, so the epoch's append
    // is already committed), not trusted from source-side counters
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
            p.durationMs.values().stream().mapToLong(_.longValue).sum(),
            r.getLong(0))
        }
      }
    })

    val q = graft.streaming.StreamingOps.neardupIngest(spark, table,
        stream, "doc_id", "text") { (pairFrame, _) =>
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
      f"wall=${wall}%.1fs sustained=${totalDocs / wall}%.0f docs/s " +
      f"pairs=${pairs.get} index_rows_per_doc=$bandsPerDoc%.2f")
    require(snap.size >= 3, s"wanted >=3 epochs, got ${snap.size}")
    // the state-growth invariant from the doc: bands(=4) rows per doc
    require(math.abs(bandsPerDoc - 4.0) < 0.01,
      s"index must grow by exactly bands rows per doc, got $bandsPerDoc")
    spark.stop()
  }
}
