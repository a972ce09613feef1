package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is FULLY evaluated through a noop
  * sink (a bare `count()` would let Catalyst prune the projections and
  * time little more than a parquet row count). Failures are recorded as
  * failures — never as timings — and make the run exit non-zero.
  *
  * Regression gate: timings are compared against the newest
  * `bench_r*.json` history file in the cwd (override with
  * SPARK_GRAFT_BENCH_PREV). Any query slower than REGRESSION_FACTOR ×
  * its historical min is RE-MEASURED with extra reps before it is
  * called a regression — a single slow timing under a 32-thread local
  * scheduler is usually machine contention, not a plan change (r5
  * post-mortem: q_revenue_by_nation benched 3.0× slower with zero
  * source change; isolated re-runs matched the old number exactly).
  * Survivors are reported in the JSON as `"regressions"` and on
  * stderr, but do not fail the run: the artifact is the record.
  */
/** The regression-gate arithmetic, separated from the Spark harness so
  * BenchGateSpec can pin it: history merging (element-wise min across
  * rounds) and the suspect test (factor over the bar, above the noise
  * floor).
  */
object BenchGate {
  val RegressionFactor = 1.5
  // ignore sub-noise-floor drift: a 0.1 s → 0.2 s "2×" is scheduler
  // jitter, not a plan regression worth re-measuring. 0.75 is the
  // noise this machine actually shows: the r6 artifact gate-flagged
  // q_budget_sample at 0.63 s vs a 0.36 s bar with zero source change
  // to it, and the very next isolated run hit 0.36 s again.
  val RegressionMinSec = 0.75

  /** A query is suspect iff its best timing exceeds the larger of
    * factor × its historical bar and the noise floor. No history → no
    * bar → never suspect (a NEW query cannot regress).
    */
  def suspect(best: Double, bar: Option[Double]): Boolean =
    bar.exists(b => best > (b * RegressionFactor).max(RegressionMinSec))

  /** A whole ROUND is an outlier when its total over its own queries
    * is under this fraction of what the per-query median across all
    * rounds predicts for the same query set. The r11 history file was
    * uniformly ~2× faster than every round before and after it (a
    * machine state, not a code state); taking element-wise mins over
    * it set an unreachable bar and shipped 47 phantom "regressions"
    * in BENCH_r13. A faster machine moves every query together, so a
    * round-level total test catches it; a genuine plan win moves only
    * the queries whose plans changed and survives this filter.
    */
  val OutlierRoundFraction = 0.6

  /** Drop rounds that are anomalously fast as a whole (see
    * [[OutlierRoundFraction]]). Needs >= 3 rounds for the per-query
    * median to be meaningful; below that, keep everything.
    */
  def rejectOutlierRounds(rounds: Seq[Map[String, Double]])
      : Seq[Map[String, Double]] = {
    if (rounds.size < 3) return rounds
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val perQuery = rounds.flatten.groupMap(_._1)(_._2)
      .map { case (k, vs) => k -> median(vs.toSeq) }
    rounds.filter { r =>
      val expected = r.keysIterator.map(perQuery).sum
      expected <= 0.0 ||
        r.valuesIterator.sum >= OutlierRoundFraction * expected
    }
  }

  /** INTENDED cost changes: query → new baseline floor. A history
    * bar BELOW the floor predates a deliberate semantic change and
    * must not flag forever. One entry so far: q_pdf_encrypted's
    * pre-round-15 history (≈1.6 s) predates the AES-256 R6 handler —
    * ISO 32000-2's Algorithm 2.B hardened hash is an intentionally
    * slow KDF (per-document, map-only, linear; both the fixture
    * writer and the reader run it), measured at ≈8.6–9.0 s. Each
    * entry documents a design decision, not a tolerance knob.
    */
  val IntendedCosts: Map[String, Double] = Map(
    "q_pdf_encrypted" -> 8.0)

  /** A single QUERY's recorded value is an outlier when it falls
    * under this fraction of that query's own median across rounds —
    * the per-query analog of [[OutlierRoundFraction]]. Round 16
    * produced the motivating case: q_brotli_roundtrip recorded
    * 0.49 s in two consecutive sweeps (run-order file-cache warmth
    * after ten new queries shifted its neighbors) against a
    * 1.4–1.9 s history, and an isolated 7-rep forensic run measured
    * 1.40 s best — taking the min over the warm values would have
    * flagged every honest future run. A genuine plan win shifts the
    * MEDIAN as later rounds corroborate it, so the bar follows real
    * improvements with a lag instead of chasing one-off dips.
    */
  val OutlierQueryFraction = 0.6

  private def rejectOutlierValues(vs: Seq[Double]): Seq[Double] = {
    if (vs.size < 3) return vs
    val s = vs.sorted
    val m =
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    val kept = vs.filter(_ >= OutlierQueryFraction * m)
    if (kept.isEmpty) vs else kept
  }

  /** Element-wise MIN across per-round query maps — "best ever
    * recorded" is the right bar; the newest round alone would reset the
    * bar after any noisy round. Whole-round outliers (one run on a
    * faster machine state) are rejected first so they cannot poison
    * the bar for every future artifact; per-query dips far below the
    * query's own median (run-order cache warmth) are rejected next.
    * Intended-cost floors lift bars that predate deliberate semantic
    * changes.
    */
  def mergeHistory(rounds: Seq[Map[String, Double]])
      : Map[String, Double] =
    rejectOutlierRounds(rounds)
      .flatten.groupMap(_._1)(_._2)
      .map { case (k, vs) =>
        k -> rejectOutlierValues(vs.toSeq).min
      }
      .map { case (k, v) =>
        k -> math.max(v, IntendedCosts.getOrElse(k, 0.0))
      }

  /** Parse one bench artifact's `queries` map (Jackson ships in
    * Spark's jars, so no extra dependency).
    */
  def parseQueries(json: Array[Byte]): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val qs = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).path("queries")
    qs.properties().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
  }
}

object Bench {
  import BenchGate.{suspect, RegressionFactor}

  /** Per-query historical bar over every `bench_r*.json` in the cwd
    * (or just the file SPARK_GRAFT_BENCH_PREV points at).
    */
  private def loadPrev(): Map[String, Double] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val paths = sys.env.get("SPARK_GRAFT_BENCH_PREV") match {
      case Some(p) => Seq(Paths.get(p))
      case None =>
        val rx = "bench_r\\d+[a-z_]*\\.json".r
        scala.util.Using.resource(Files.list(Paths.get("."))) { s =>
          s.iterator().asScala
            .filter(p => rx.matches(p.getFileName.toString)).toSeq
        }
    }
    BenchGate.mergeHistory(paths.filter(Files.exists(_))
      .map(p => BenchGate.parseQueries(Files.readAllBytes(p))))
  }

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
    // optional comma-separated query filter for single-query forensics
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val failures = Seq.newBuilder[String]
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None        => SparkEntry.queries
    }
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = selected.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try Some(name -> (1 to reps).map(_ => time(fn)))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failures += name
            None
        }
    }
    // regression gate vs the newest bench_r*.json: suspects get 2
    // extra reps AFTER the full sweep (the end-of-run JVM is the
    // quietest moment) so one noisy timing can't brand a plan
    val prev = try loadPrev() catch {
      case e: Exception =>
        System.err.println(s"[bench] could not load history: $e")
        Map.empty[String, Double]
    }
    val fnByName = selected
    val gated = results.map { case (name, times) =>
      val base = prev.get(name)
      if (!suspect(times.min, base)) (name, times, false)
      else {
        val extra = (1 to 2).flatMap { _ =>
          try Some(time(fnByName(name)))
          catch { case _: Throwable => None }
        }
        val all = times ++ extra
        val still = suspect(all.min, base)
        if (still) System.err.println(
          f"[bench] REGRESSION $name: best ${all.min}%.2f s vs " +
          f"history ${base.get}%.2f s (>${RegressionFactor}x, " +
          "survived re-measurement)")
        (name, all, still)
      }
    }
    val qs = gated.map { case (k, v, _) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // per-rep timings: lets a reader separate plan cost (stable min)
    // from scheduler/environment contention (wild rep spread)
    val rs = gated.map { case (k, v, _) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val regs = gated.collect { case (k, v, true) =>
      s"\"" + k + "\":" + v.min }.mkString("{", ",", "}")
    val failed = failures.result()
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = gated.map(_._2.min).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$rs,"regressions":$regs,"failed":$fs,"sf":"$sfDir"}"""
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
