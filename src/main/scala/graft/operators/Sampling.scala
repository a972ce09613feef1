package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines. `rand()`-based sampling is neither reproducible across
  * runs (without careful seeding per partitioning) nor portable across
  * engines; keying on a cryptographic hash of a stable id is both: the
  * same row lands in the same split on any engine, any partitioning,
  * any day — and adding data never reshuffles existing assignments
  * (the property that keeps train/test splits honest over time).
  */
object Sampling {

  /** Uniform [0, 1) score from the md5 of the id's string form: the
    * first 15 hex digits (60 bits, exactly what [[graft.functions
    * .HashFunctions.stableHash60]] uses) divided by 16^15. Collision-
    * free enough for splitting; identical in any engine with md5.
    */
  def hashScore(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 16^15 = 2^60

  /** Keep ~`fraction` of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double)
      : DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    df.filter(hashScore(col(idCol)) < fraction)
  }

  /** Assign every row to a named split with the given weights
    * (normalized), deterministically by id: split i gets the score
    * interval [cum_{i-1}, cum_i). Appends `splitCol`.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split")
      : DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    val cuts  = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val score = hashScore(col(idCol))
    // last split takes the remainder so score == 1.0 - eps rounds in
    val expr = splits.init.zip(cuts.init)
      .foldLeft(when(lit(false), lit(""))) { case (w, ((name, _), cut)) =>
        w.when(score < cut, lit(name))
      }.otherwise(lit(splits.last._1))
    df.withColumn(splitCol, expr)
  }

  /** Per-stratum deterministic sampling: each row keeps iff its hash
    * score falls under its stratum's fraction (`default` for strata not
    * in the map). One codegen'd filter — no shuffle, no per-stratum
    * pass, unlike `df.stat.sampleBy` (which is rand()-based and not
    * reproducible across partitionings anyway). The classic use is
    * rebalancing a corpus by source/language while keeping membership
    * stable as the corpus grows.
    */
  def stratifiedSampleByHash(df: DataFrame, idCol: String,
      stratumCol: String, fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ default)
        .forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    // sorted for a deterministic when-chain (Map order is not stable)
    val cut = fractions.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (w, (s, f)) =>
        w.when(col(stratumCol) === s, lit(f))
      }.otherwise(lit(default))
    df.filter(hashScore(col(idCol)) < cut)
  }

  /** Resample a corpus to a TARGET mix over a stratum column (the
    * training-data "recipe": 30% web, 30% code, 40% books…): computes
    * the largest total size N* at which every stratum can meet its
    * target share by DOWNSAMPLING only (N* = min over strata of
    * count_s / share_s, shares normalized), then keeps each stratum
    * with probability share_s · N* / count_s via the deterministic hash
    * filter. Strata absent from `targets` are dropped. One bounded
    * aggregation (|strata| rows to the driver) + one codegen'd filter;
    * no shuffle of the data itself, membership growth-stable.
    */
  def mixToTarget(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val total = targets.values.sum
    val shares = targets.map { case (s, w) => s -> w / total }
    val counts = df
      .filter(col(stratumCol).isin(targets.keys.toSeq.map(lit): _*))
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.keys.find(s => counts.getOrElse(s, 0L) == 0L).foreach(s =>
      throw new IllegalArgumentException(
        s"stratum '$s' has a target share but no rows"))
    val nStar = shares.map { case (s, sh) => counts(s) / sh }.min
    val fractions = shares.map { case (s, sh) =>
      s -> math.min(sh * nStar / counts(s), 1.0) }
    stratifiedSampleByHash(df, idCol, stratumCol, fractions,
      default = 0.0)
  }

  /** Per-ROW weighted Bernoulli sampling: keep each row with its OWN
    * probability from `weightCol` (clamped to [0, 1]), deterministically
    * by id — the quality-weighted corpus downsampling shape ("keep
    * high-quality documents with p≈1, boilerplate with p≈0.1") that
    * rebalances without hard cutoffs. One codegen'd filter, no shuffle,
    * membership stable under corpus growth like every hash-keyed
    * sampler here.
    */
  def weightedSampleByHash(df: DataFrame, idCol: String,
      weightCol: String): DataFrame =
    df.filter(hashScore(col(idCol)) <
      least(greatest(col(weightCol), lit(0.0)), lit(1.0)))

  /** Leakage-safe train/val/test assignment: split by DUPLICATE
    * CLUSTER, not by document, so a pair of near-duplicates can never
    * straddle train and test (the classic eval-contamination bug —
    * a per-id split puts ~(1−Σwᵢ²) of duplicate pairs across the
    * boundary). Composes [[graft.operators.Dedup.duplicateClusters]]
    * over `pairs` with [[deterministicSplit]] keyed on the cluster
    * representative: every member inherits its cluster's assignment,
    * singletons hash on themselves, and the membership stays stable
    * under corpus growth exactly like the per-id split.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], splitCol: String = "split",
      maxIter: Int = 20): DataFrame = {
    val clusters = Dedup.duplicateClusters(
      df.select(col(idCol)), idCol, pairs, maxIter)
    val assigned = deterministicSplit(
      clusters.select(col("id").as(idCol), col("cluster_id")),
      "cluster_id", splits, splitCol)
      .drop("cluster_id")
    df.join(assigned, Seq(idCol))
  }

  /** Fill per-source TOKEN budgets: within each source (a key of
    * `budgets`), documents are admitted in hash-priority order —
    * ordered by (hashScore(id), id) — until the budget is reached. A
    * document is kept iff the token total of the documents strictly
    * before it is < the budget, so the crossing document is included:
    * budgets are met, never undershot. Sources without a budget are
    * dropped. This is the "assemble an N-token training mix from
    * oversized corpora" shape — absolute token targets, where
    * [[mixToTarget]] is the relative recipe.
    *
    * Scale: the corpus never shuffles — only the (source, score, id,
    * tokens) projection does, through ONE range exchange on
    * (source, score, id). Per-source running sums are sequential per
    * partition (a source spans contiguous range partitions), the
    * per-(partition, source) totals — at most partitions + |sources|
    * rows, a bound independent of data volume — come to the driver
    * for prefix offsets, and the kept-id set joins back by id. No
    * per-source window partition, so one giant source cannot create
    * the single straggler task the naive `sum() OVER (PARTITION BY
    * source ...)` formulation degrades to.
    */
  def budgetSample(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0L),
      "budgets must be non-empty and non-negative")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(
        col(sourceCol).cast("string").as("__s"),
        hashScore(col(idCol)).as("__sc"),
        col(idCol).as("__id"),
        col(tokenCol).cast("long").as("__t"))
      .filter(col("__s").isin(budgets.keys.toSeq.sorted.map(lit): _*))
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val outSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("__s", StringType),
      StructField("__id", df.schema(idCol).dataType),
      StructField("__excl", LongType, nullable = false),
      StructField("__lrun", LongType, nullable = false)))
    val local = proj
      .repartitionByRange(parts, col("__s"), col("__sc"), col("__id"))
      .sortWithinPartitions("__s", "__sc", "__id")
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var cur: String = null
        var run = 0L
        it.map { r =>
          val s = r.getString(0)
          if (s != cur) { cur = s; run = 0L }
          val excl = run
          run += r.getLong(3)
          Row(pid, s, r.get(2), excl, run)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .localCheckpoint() // materialize once: totals agg + final filter
    val totals = local.groupBy("pid", "__s")
      .agg(max("__lrun").as("__pt"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      val offs = sorted.map(_._3).scanLeft(0L)(_ + _).init
      sorted.zip(offs).map { case ((pid, s, _), off) => (pid, s, off) }
    }
    val offDf =
      if (offsets.isEmpty)
        Seq.empty[(Int, String, Long)].toDF("pid", "__s", "__off")
      else offsets.toDF("pid", "__s", "__off")
    // deterministic when-chain (Map order is not stable)
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (w, (s, b)) =>
        w.when(col("__s") === s, lit(b))
      }.otherwise(lit(0L))
    val keptIds = local.join(broadcast(offDf), Seq("pid", "__s"))
      .filter(col("__excl") + col("__off") < budgetCol)
      .select(col("__id").as(idCol))
    df.join(keptIds, Seq(idCol), "left_semi")
  }

  /** Temperature-based mixture sampling — the published multilingual/
    * data-mixing recipe (sample source i ∝ massᵢ^α): per-source token
    * budgets `floor(totalBudget · wᵢ / Σw)` with `wᵢ = massᵢ^α`, then
    * the [[budgetSample]] deterministic hashed-prefix selection under
    * those budgets. α < 1 flattens the mixture toward small sources
    * (α = 1 is proportional, i.e. no reweighting).
    *
    * α is restricted to quarters (`alphaQuarters`/4 ∈ {¼, ½, ¾, 1})
    * so every weight is a composition of IEEE-correctly-rounded
    * `sqrt`/`·` — `m^¼ = √√m`, `m^¾ = √m·√√m` — bit-reproducible on
    * any engine, where a libm `pow` is not (same trade as the
    * rational-idf/lift operators). Σw folds left in source order.
    *
    * A source whose budget exceeds its mass just keeps everything
    * (no waterfilling redistribution of the slack — the leftover
    * budget is reported by comparing the output's mass, not silently
    * reallocated; document pipelines re-run with a higher budget).
    *
    * Driver state: one (source, mass) row per source — the same
    * bounded-dictionary collect the binning/centroid fits use.
    */
  def temperatureMix(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, totalBudget: Long,
      alphaQuarters: Int = 2): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be > 0: $totalBudget")
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters must be in 1..4, got $alphaQuarters")
    val masses = df
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").as("__s"))
      .agg(sum(col(tokenCol).cast("long")).as("__m"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0L)
      .sortBy(_._1)
    def weight(m: Long): Double = {
      val d = m.toDouble
      alphaQuarters match {
        case 1 => math.sqrt(math.sqrt(d))
        case 2 => math.sqrt(d)
        case 3 => math.sqrt(d) * math.sqrt(math.sqrt(d))
        case _ => d
      }
    }
    if (masses.isEmpty) return df.limit(0) // nothing with mass: empty
    val ws = masses.map { case (s, m) => s -> weight(m) }
    val sw = ws.foldLeft(0.0)(_ + _._2) // left fold in source order
    val budgets = ws.map { case (s, w) =>
      s -> math.floor(totalBudget.toDouble * w / sw).toLong
    }.toMap
    budgetSample(df, idCol, tokenCol, sourceCol, budgets)
  }

  /** Keep the `k` best rows per group by `scoreCol` (descending),
    * ties broken by ascending id so the selection is total-order
    * deterministic. Spark ≥3.5 rewrites the rank-filter into
    * WindowGroupLimit: each map task keeps a per-group top-k heap
    * BEFORE the shuffle, so the exchange carries ≤ k·groups rows per
    * task instead of the whole table — the same shape a hand-built
    * per-partition heap would give, for free from the optimizer.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
