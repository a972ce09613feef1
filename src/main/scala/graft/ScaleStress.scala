package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness (diagnostic main, not part of the bench): runs
  * the heavy dedup pipelines on sf0.1 documents and on a 10×
  * replication of them, and reports the wall-time and shuffle-record
  * growth ratios. Linear-ish ratios (≈10× work for 10× data) are the
  * evidence that no stage hides super-linear behavior that small-SF
  * correctness runs can't see.
  *
  * The replicas get distinct ids AND per-replica character
  * translation of the text (a rotation of the most frequent letters —
  * an appended marker is NOT enough: MinHash signatures survive a
  * short suffix, every doc then has 10 near-copies, and candidate
  * pairs grow ~100× BY CONSTRUCTION of the data). The translation
  * preserves each replica's INTERNAL duplicate structure while making
  * replicas mutually dissimilar, so the measurement isolates the
  * OPERATOR's scaling, not the dataset's.
  *
  * Usage: `sbt "runMain graft.ScaleStress"` (env SPARK_GRAFT_SF_DIR
  * overrides the base dir). Writes the 10× set under
  * ./stress_data/ and prints one result line per (pipeline, scale).
  */
object ScaleStress {

  private val Pipelines =
    Seq("q_dedup_clean", "q_substring_scrub", "q_leakage_safe_split")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stressDir = "stress_data"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val alpha = "etaoinshr"
    (0 until 10).map { k =>
      val rot = alpha.drop(k) + alpha.take(k)
      docs.withColumn("doc_id", col("doc_id") + lit(k * maxId))
        .withColumn("text", concat(
          translate(col("text"), alpha, rot),
          lit(s" stressmarker$k end")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite")
      .parquet(s"$stressDir/documents.parquet")

    // shuffle records via task metrics: records WRITTEN to shuffle is
    // the "rows moved" number a super-linear stage would inflate
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val read    = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          read.addAndGet(m.shuffleReadMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(name: String, dir: String): (Double, Long, Long) = {
      // warm the reader path so the first pipeline doesn't pay init
      spark.read.parquet(s"$dir/documents.parquet").count()
      written.set(0); read.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener delivery is async: wait for the counters to go quiet
      var last = (-1L, -1L)
      while (last != ((written.get, read.get))) {
        last = (written.get, read.get); Thread.sleep(300)
      }
      (wall, written.get, read.get)
    }

    println(f"${"pipeline"}%-22s ${"scale"}%5s ${"wall_s"}%8s " +
      f"${"shuf_write"}%12s ${"shuf_read"}%12s")
    val rows = Pipelines.map { p =>
      val (w1, sw1, sr1)    = measure(p, sfDir)
      val (w10, sw10, sr10) = measure(p, stressDir)
      println(f"$p%-22s    1x ${w1}%8.2f ${sw1}%12d ${sr1}%12d")
      println(f"$p%-22s   10x ${w10}%8.2f ${sw10}%12d ${sr10}%12d")
      val ratio = f"wall ${w10 / w1}%.1fx  shufW ${
        sw10.toDouble / math.max(sw1, 1)}%.1fx  shufR ${
        sr10.toDouble / math.max(sr1, 1)}%.1fx"
      println(s"$p RATIOS (10x data): $ratio")
      (p, w10 / w1, sw10.toDouble / math.max(sw1, 1))
    }
    val bad = rows.filter { case (_, w, s) => w > 20.0 || s > 15.0 }
    if (bad.nonEmpty) {
      println(s"SUPER-LINEAR SUSPECTS: ${bad.map(_._1).mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    println("ALL PIPELINES SCALE ~LINEARLY")
    spark.stop()
  }
}
