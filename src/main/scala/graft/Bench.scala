package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is FULLY evaluated through a noop
  * sink (a bare `count()` would let Catalyst prune the projections and
  * time little more than a parquet row count). Failures are recorded as
  * failures — never as timings — and make the run exit non-zero.
  *
  * KILL-SAFETY: the artifact file (SPARK_GRAFT_BENCH_OUT, default
  * bench_out.json) is REWRITTEN after every completed query with the
  * partial sweep so far (`"partial":true` until the final write). The
  * r16 driver sweep was timeout-killed ~5 queries from the end after a
  * host load spike and, because the old runner emitted once at exit,
  * the round had NO parseable bench artifact at all. A kill now leaves
  * the last-written partial record — one valid JSON line, same shape.
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
  * rounds), the suspect test (factor over the bar, above the noise
  * floor), and host-offset detection for uniformly-slow sweeps.
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

  /** A flagged query whose best exceeds this factor over its bar is
    * a host STALL, not a regression: a genuine plan change does not
    * produce 10–189× (the r18 driver artifact recorded q_xlsx_strings
    * at 206 s vs a 1.09 s local best on code the round never
    * touched). Stalls are reported under a separate artifact key so
    * an official sweep on a stalling host stops reading as dozens of
    * regressions.
    */
  val StallFactor = 10.0

  /** Classify a surviving suspect: true = host stall (over
    * [[StallFactor]] × bar), false = genuine regression candidate.
    */
  def isStall(best: Double, bar: Option[Double]): Boolean =
    bar.exists(b => best > (b * StallFactor).max(RegressionMinSec))

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

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
    val m = median(vs)
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

  // ----- uniformly-slow CURRENT sweep (host offset) ----------------
  //
  // rejectOutlierRounds defends the HISTORY against a uniformly-fast
  // round; nothing defended the CURRENT sweep against a uniformly-
  // slow host. Round 16's post-reboot sweeps ran a measured uniform
  // 1.37–1.42× of the pre-reboot artifact across ALL unchanged
  // queries — including map-only decode tiers whose code did not
  // change — and element-wise-min history flagged 40–55 phantom
  // "regressions" per sweep (the r11/r13 poisoning failure mode with
  // the opposite sign). A host state moves every query together; a
  // genuine plan regression moves only the query whose plan changed.
  // So: when the current sweep's per-query ratio vs the merged bars
  // is UNIFORM (most ratios inside ±15% of the median) and the median
  // exceeds 1.2×, report ONE round-level host-offset number and judge
  // each query on best/offset instead of best.

  /** Minimum median ratio before a sweep is called host-offset. */
  val HostOffsetMin = 1.2
  /** Uniformity band around the median ratio. ±15% was measured too
    * tight on the first live case: the r17 re-record sweep (median
    * ratio 1.53 vs the merged bars, the r16 reboot offset still in
    * force) put only 59.9% of ratios inside ±15% — sub-second
    * queries carry ±20-30% scheduler noise at best-of-2 reps — and
    * the gate missed the offset by 0.1% and flagged 54 phantoms.
    * ±25% captures 84.5% of that same sweep while the synthetic
    * half-1.1×/half-2.2× ragged case still lands 0% in band.
    */
  val HostOffsetBand = 0.25
  /** Fraction of measured ratios that must sit inside the band. */
  val HostOffsetUniformFraction = 0.6
  /** Minimum comparable queries for the median to mean anything,
    * and the per-query bar floor (seconds) below which a ratio is
    * scheduler noise rather than offset evidence.
    */
  val HostOffsetMinQueries = 8
  val HostOffsetBarFloor = 0.3

  /** Detect a uniform slow-host offset: Some(median ratio) when the
    * sweep is uniformly ≥1.2× its bars. `current` maps query →
    * best-of-reps this sweep; `bars` is mergeHistory's output. Only
    * queries with a bar above [[HostOffsetBarFloor]] count — ratios
    * of 0.1 s timings are jitter, not evidence.
    *
    * RAGGED fallback: the r17 driver host was slow but NON-uniformly
    * so (per-query ratios median 1.28, IQR 1.02–1.74 — co-tenant
    * contention hits queries unevenly), the uniformity test failed,
    * no offset was applied, and dozens of phantom suspects each got
    * re-measured at 2.6× slow until the external timeout. When the
    * median clears [[HostOffsetMin]] but the band test fails, the
    * host IS slow — we just can't trust the median as a single
    * number — so de-rate by the 25th-percentile ratio instead: at
    * most a quarter of queries could be genuinely regressed for P25
    * to be inflated by them, so a real regression still flags after
    * the division while the bulk of contention phantoms clear.
    */
  def hostOffset(current: Map[String, Double],
      bars: Map[String, Double]): Option[Double] = {
    val ratios = current.toSeq.collect {
      case (k, v) if bars.get(k).exists(_ >= HostOffsetBarFloor) =>
        v / bars(k)
    }
    if (ratios.size < HostOffsetMinQueries) return None
    val m = median(ratios)
    if (m <= HostOffsetMin) return None
    val inBand = ratios.count(r =>
      r >= m * (1 - HostOffsetBand) && r <= m * (1 + HostOffsetBand))
    if (inBand.toDouble / ratios.size >= HostOffsetUniformFraction)
      Some(m)
    else {
      val sorted = ratios.sorted
      val p25 = sorted((sorted.size - 1) / 4)
      if (p25 > 1.0) Some(p25) else None
    }
  }

  /** Fraction of the wall budget the regression-gate phase may
    * spend on re-measurement before surviving suspects keep their
    * raw flags un-re-measured (the r17 driver kill happened in an
    * UNBOUNDED gate phase: dozens of phantom suspects × 2 reps ×
    * a 2.6×-slow host ran past the external timeout).
    */
  val GateBudgetFraction = 0.15

  /** May the gate phase still re-measure? False once the whole
    * run is over the wall budget OR the gate phase alone has used
    * its fraction of it.
    */
  def gateMayRemeasure(runElapsedSec: Double, gateElapsedSec: Double,
      wallBudgetSec: Double): Boolean =
    runElapsedSec <= wallBudgetSec &&
      gateElapsedSec <= wallBudgetSec * GateBudgetFraction

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

  // ----- artifact rendering (pure, so BenchSpec can pin it) --------

  /** Render the artifact line. Emitted after EVERY completed query
    * (partial = true) and once at the end (partial = false): a kill
    * at any point leaves the last write — one complete JSON object
    * of the same shape the driver parses, missing only the queries
    * that never ran.
    */
  def renderArtifact(results: Seq[(String, Seq[Double])],
      regressions: Map[String, Double], failed: Seq[String],
      sf: String, partial: Boolean,
      hostOffset: Option[Double],
      stalls: Map[String, Double] = Map.empty,
      compact: Boolean = false): String = {
    // full JSON string escaping: a quote/backslash/control char in
    // the sf path or a query name must not yield an unparseable
    // artifact line — that would defeat the kill-safety goal
    def jstr(s: String) = s.foldLeft(new StringBuilder("\"")) {
      case (b, '"')           => b.append("\\\"")
      case (b, '\\')          => b.append("\\\\")
      case (b, '\n')          => b.append("\\n")
      case (b, '\r')          => b.append("\\r")
      case (b, '\t')          => b.append("\\t")
      case (b, c) if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case (b, c)             => b.append(c)
    }.append('"').toString
    val qs = results.map { case (k, v) => jstr(k) + ":" + v.min }
      .mkString("{", ",", "}")
    // per-rep timings: lets a reader separate plan cost (stable min)
    // from scheduler/environment contention (wild rep spread)
    val rs = results.map { case (k, v) =>
      jstr(k) + ":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val regs = regressions.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val sts = stalls.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map(jstr).mkString("[", ",", "]")
    val total = results.map(_._2.min).sum
    val off = hostOffset.map(o => s""","host_offset":$o""")
      .getOrElse("")
    val part = if (partial) s""","partial":true""" else ""
    // compact mode drops the per-rep arrays — they dominate the
    // line's length, and the driver's tail-window parse has missed
    // the full line four rounds running
    val reps = if (compact) "" else s""","reps":$rs"""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$reps,"regressions":$regs,"stalls":$sts,"failed":$fs$off$part,"sf":${jstr(sf)}}"""
  }
}

object Bench {
  import BenchGate.{suspect, RegressionFactor}

  /** Per-query historical bar over every `bench_r*.json` in the cwd
    * (or just the file SPARK_GRAFT_BENCH_PREV points at). The run's
    * OWN artifact file is excluded: with streamed partial emission
    * the current sweep's timings are already on disk when the gate
    * loads history, and merging them in pins improved queries' bars
    * to exactly this run's values — which skews the host-offset
    * uniformity statistic toward 1.0.
    */
  private def loadPrev(selfOut: String): Map[String, Double] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val self = Paths.get(selfOut).toAbsolutePath.normalize
    val paths = sys.env.get("SPARK_GRAFT_BENCH_PREV") match {
      // the same self-exclusion as the scan branch: if PREV points at
      // the live BENCH_OUT file, the streamed partial emission would
      // re-merge the current sweep into its own bars
      case Some(p) => Seq(Paths.get(p))
        .filter(_.toAbsolutePath.normalize != self)
      case None =>
        val rx = "bench_r\\d+[a-z_]*\\.json".r
        scala.util.Using.resource(Files.list(Paths.get("."))) { s =>
          s.iterator().asScala
            .filter(p => rx.matches(p.getFileName.toString))
            .filter(p => p.toAbsolutePath.normalize != self)
            .toSeq
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
      // survive host load spikes as SLOW timings, not a dead
      // SparkContext: the r16 driver sweep died to 10 s heartbeat
      // RPC timeouts under oversubscription (executor and driver
      // share one JVM here — a timeout can only ever be scheduler
      // starvation, never a lost node)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.rpc.askTimeout", "600s")
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
    // wall budget (seconds): once the sweep has consumed it, the
    // remaining queries run ONE rep instead of `reps` — a contended
    // host degrades to noisier timings instead of an external
    // timeout kill. Generous by default: a healthy sweep takes
    // ~4–7 min; the r16 kill came after ~100.
    val wallBudget = sys.env.getOrElse(
      "SPARK_GRAFT_WALL_BUDGET_SEC", "2400").toDouble
    val sweepT0 = System.nanoTime()
    def overBudget: Boolean =
      (System.nanoTime() - sweepT0) / 1e9 > wallBudget
    // optional comma-separated query filter for single-query forensics
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
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
    // the artifact must survive log-tail truncation AND a mid-sweep
    // kill: rewrite the file after every completed query
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_out.json")
    def emit(results: Seq[(String, Seq[Double])],
        regressions: Map[String, Double], failed: Seq[String],
        partial: Boolean, hostOff: Option[Double],
        stalls: Map[String, Double] = Map.empty): String = {
      val line = BenchGate.renderArtifact(results, regressions,
        failed, sfDir, partial, hostOff, stalls)
      try {
        val tmp = java.nio.file.Paths.get(outPath + ".tmp")
        java.nio.file.Files.write(tmp, (line + "\n").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(outPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case e: Exception =>
          System.err.println(s"[bench] could not write $outPath: $e")
      }
      line
    }
    val failures = Seq.newBuilder[String]
    val done = Seq.newBuilder[(String, Seq[Double])]
    val names = selected.toSeq.sortBy(_._1)
    names.foreach { case (name, fn) =>
      val effReps = if (overBudget) 1 else reps
      try {
        val ts = (1 to effReps).map(_ => time(fn))
        done += ((name, ts))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures += name
      }
      // stdout AND file: a kill between the last file write and the
      // driver's log capture still leaves the newest complete line
      // in stdout for the driver's line-parse to recover
      println(emit(done.result(), Map.empty, failures.result(),
        partial = true, hostOff = None))
    }
    val results = done.result()
    // regression gate vs the newest bench_r*.json: suspects get 2
    // extra reps AFTER the full sweep (the end-of-run JVM is the
    // quietest moment) so one noisy timing can't brand a plan
    val prev = try loadPrev(outPath) catch {
      case e: Exception =>
        System.err.println(s"[bench] could not load history: $e")
        Map.empty[String, Double]
    }
    // divide out a uniform slow-host offset before judging anything:
    // r16's post-reboot sweeps were a measured uniform 1.37–1.42×
    // and shipped 40–55 phantom regressions per artifact
    val hostOff = BenchGate.hostOffset(
      results.map { case (k, v) => k -> v.min }.toMap, prev)
    hostOff.foreach(o => System.err.println(
      f"[bench] HOST OFFSET: sweep is a uniform $o%.2fx of history " +
      "(machine state, not code) — judging best/offset"))
    val scale = hostOff.getOrElse(1.0)
    val fnByName = selected
    // GATE PHASE BUDGET: the r17 driver run was killed HERE — the
    // sweep itself finished (kill-safe partial had all 286 queries)
    // but a ragged 2.6×-slow host turned dozens of queries suspect
    // and each got 2 extra reps at 2.6× slow with no budget check,
    // until the external timeout landed mid-gate (rc=124, third red
    // official artifact in a row). The re-measure loop now (a) stops
    // re-measuring once the whole run is over the wall budget OR the
    // gate phase alone has used 15% of it — surviving suspects keep
    // their raw flag, honestly labeled, instead of stalling the
    // artifact — and (b) re-emits the partial artifact after every
    // re-measured query so a kill inside the gate still leaves the
    // newest complete record.
    val gateT0 = System.nanoTime()
    def gateOverBudget: Boolean = !BenchGate.gateMayRemeasure(
      (System.nanoTime() - sweepT0) / 1e9,
      (System.nanoTime() - gateT0) / 1e9, wallBudget)
    // flag: 0 = clean, 1 = regression, 2 = host stall (>=10x bar —
    // a plan change does not produce 189x; see BenchGate.StallFactor)
    val gatedB = Seq.newBuilder[(String, Seq[Double], Int)]
    def classify(best: Double, base: Option[Double]): Int =
      if (BenchGate.isStall(best / scale, base)) 2 else 1
    results.foreach { case (name, times) =>
      val base = prev.get(name)
      if (!suspect(times.min / scale, base))
        gatedB += ((name, times, 0))
      else if (gateOverBudget) {
        System.err.println(
          f"[bench] REGRESSION? $name: best ${times.min}%.2f s vs " +
          f"history ${base.get}%.2f s — NOT re-measured (gate over " +
          "wall budget), raw flag kept")
        gatedB += ((name, times, classify(times.min, base)))
      } else {
        val extra = (1 to 2).flatMap { _ =>
          try Some(time(fnByName(name)))
          catch { case _: Throwable => None }
        }
        val all = times ++ extra
        val still = suspect(all.min / scale, base)
        val flag = if (!still) 0 else classify(all.min, base)
        if (still) System.err.println(
          f"[bench] ${if (flag == 2) "STALL" else "REGRESSION"} " +
          f"$name: best ${all.min}%.2f s vs " +
          f"history ${base.get}%.2f s (>${RegressionFactor}x" +
          (if (scale != 1.0) f" after /$scale%.2f host offset" else "") +
          ", survived re-measurement)")
        gatedB += ((name, all, flag))
        val soFar = gatedB.result()
        println(emit(
          soFar.map { case (k, v, _) => (k, v) } ++
            results.drop(soFar.size),
          soFar.collect { case (k, v, 1) => k -> v.min }.toMap,
          failures.result(), partial = true, hostOff = hostOff,
          stalls = soFar.collect { case (k, v, 2) => k -> v.min }
            .toMap))
      }
    }
    val gated = gatedB.result()
    val failed = failures.result()
    val regs = gated.collect { case (k, v, 1) => k -> v.min }.toMap
    val stalls = gated.collect { case (k, v, 2) => k -> v.min }.toMap
    val line = emit(
      gated.map { case (k, v, _) => (k, v) },
      regs, failed, partial = false, hostOff = hostOff,
      stalls = stalls)
    println(line)
    spark.stop()
    // the COMPACT artifact line is the process's very last stdout —
    // after Spark's shutdown noise — so any driver tail-window parse
    // finds a complete line (`parsed: null` persisted four rounds
    // while the full line sat mid-log). Same shape minus the
    // per-rep arrays that dominate its length.
    System.out.flush()
    println(BenchGate.renderArtifact(
      gated.map { case (k, v, _) => (k, v) }, regs, failed, sfDir,
      partial = false, hostOffset = hostOff, stalls = stalls,
      compact = true))
    System.out.flush()
    if (failed.nonEmpty) sys.exit(1)
  }
}
