package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.operators.ProductQuant.PqCodebook

/** Streaming ANN ingest throughput harness (diagnostic main, not part
  * of the bench): builds a persistent IVF-PQ index over the sf0.1
  * embeddings, then streams RATE-SOURCE synthetic vectors through
  * [[graft.streaming.StreamingOps.annIngest]] — every micro-batch is
  * searched against the standing compressed index (top-k by exact
  * asymmetric distance) and appended with the stored quantizers —
  * reporting per-epoch vectors, wall, vecs/s and index growth.
  *
  * Synthetic vectors are deterministic hash mixes in the corpus's
  * value range (milli-unit scale ±500), with one row in 16 an EXACT
  * copy of its predecessor (same seed), so the search path always has
  * true near-neighbors to find across epochs — identical codes rank
  * at the head of the tie class.
  *
  * State sizing: the index grows by exactly ONE row per vector — (id
  * 8 B, m codes ~4 B each, list id 4 B) ≈ 28 B/vec raw at m = 4 —
  * versus 256 B for the raw float vector: a year of 10M vecs/day is
  * ~100 GB of codes instead of ~1 TB of vectors, and bucket pruning
  * keeps every search touching only probed lists regardless of size.
  *
  * Usage: `sbt "runMain graft.AnnThroughput"`. Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_STREAM_SECS (default 20), SPARK_GRAFT_STREAM_RPS
  * (default 2000).
  */
object AnnThroughput {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val runSecs =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "2000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = "graft_ann_tp_idx"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val maxId = emb.agg(max("vec_id")).head().getLong(0) + 1L
    // 64 coarse lists, 4 probed: each search touches ~6% of the
    // index (the pruning dial a 100 TB deployment turns up further)
    val nCents =
      sys.env.getOrElse("SPARK_GRAFT_ANN_CENTROIDS", "64").toInt
    val cb = graft.operators.ProductQuant.pqFit(emb, "vec_id",
      "embedding", m = 4, ksub = 16, iters = 3)
    graft.operators.IvfPqIndex.build(emb, "vec_id", "embedding",
      table, cb, nCentroids = nCents, kmeansIters = 2,
      buckets = nCents)
    val baseRows = spark.table(table).count()

    // deterministic synthetic vectors, 1-in-16 an exact copy of the
    // previous row (same seed -> same components)
    val seed = pmod(when(pmod(col("value"), lit(16)) === 1,
      col("value") - 1).otherwise(col("value")), lit(999983L))
    val comps = (0 until dim).map { i =>
      ((pmod(seed * lit(2654435761L) +
        lit(i.toLong * 1099511628211L), lit(1001L)) - lit(500L))
        .cast("double") / lit(1000.0)).cast("float")
    }
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select((col("value") + maxId).as("vec_id"),
        array(comps: _*).as("embedding"))

    case class Epoch(id: Long, vecs: Long, ms: Long, idxRows: Long)
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Epoch]
    val hits = new java.util.concurrent.atomic.AtomicLong
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
              when(col("neighbor_id") >= maxId,
                col("neighbor_id")))).head()
          epochs += Epoch(p.batchId, r.getLong(1),
            p.durationMs.values().stream().mapToLong(_.longValue).sum(),
            r.getLong(0))
        }
      }
    })

    val q = graft.streaming.StreamingOps.annIngest(spark, table,
        stream, "vec_id", "embedding", k = 10, nProbe = 4) {
      (hitFrame, _) => hits.addAndGet(hitFrame.count()); ()
    }
    val t0 = System.nanoTime()
    Thread.sleep(runSecs * 1000L)
    q.stop(); q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val snap = epochs.synchronized(epochs.toVector)
    println(f"${"epoch"}%6s ${"vecs"}%8s ${"batch_ms"}%9s " +
      f"${"vecs/s"}%8s ${"index_rows"}%11s")
    var prevVecs = 0L
    snap.foreach { e =>
      val d = e.vecs - prevVecs; prevVecs = e.vecs
      val vps = if (e.ms > 0) d * 1000 / e.ms else 0L
      println(f"${e.id}%6d $d%8d ${e.ms}%9d $vps%8d ${e.idxRows}%11d")
    }
    // the listener's per-epoch probe is best-effort (its own table
    // count can lag fast epochs); the TOTAL reads the index directly
    val fin = spark.table(table).agg(count(lit(1)), count_distinct(
      when(col("neighbor_id") >= maxId, col("neighbor_id")))).head()
    val total = fin.getLong(1)
    println(f"TOTAL $total%d vecs, $wall%.1f s wall, " +
      f"${(total / wall).toInt}%d vecs/s sustained, " +
      f"${hits.get}%d search hits, base $baseRows%d -> " +
      f"${fin.getLong(0)}%d rows")
    Seq(table, s"${table}_centroids", s"${table}_codebook",
        s"${table}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
