package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is FULLY evaluated through a noop
  * sink (a bare `count()` would let Catalyst prune the projections and
  * time little more than a parquet row count). Failures are recorded as
  * failures — never as timings — and make the run exit non-zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup pass: JVM/codegen/parquet-reader init would
    // otherwise land entirely on whichever query runs first
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("sum(l_quantity)", "count(distinct l_returnflag)")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // best-of-N per query (default 2): a single timing of a ~1 s query
    // under a 32-thread local scheduler swings several× on environment
    // noise; the min of N runs is the stable "cost of the plan" number
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val failures = Seq.newBuilder[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          Some(name -> times)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failures += name
            None
        }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // per-rep timings: lets a reader separate plan cost (stable min)
    // from scheduler/environment contention (wild rep spread)
    val rs = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = failures.result()
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2.min).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$rs,"failed":$fs,"sf":"$sfDir"}"""
    println(line)
    // the artifact must survive log-tail truncation: also write it to a
    // file (SPARK_GRAFT_BENCH_OUT, default bench_out.json in the cwd)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $outPath: $e")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
