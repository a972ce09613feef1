package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation utilities.
  *
  * Preferred order of defense at scale: (1) map-side partial
  * aggregation (free on every groupBy here), (2) AQE skew-join
  * splitting (on by default), (3) THESE — for the cases the first two
  * can't touch: a shuffle join against a small-but-not-broadcastable
  * dimension with pathological hot keys, or an aggregation whose
  * per-key state is too wide for partial aggregation to compress.
  */
object Skew {

  /** Salted equi-join: the fact side gets a deterministic per-row salt
    * (`rand(seed)` — reproducible under task retry), the dimension side
    * is exploded ×`salt`, and the join key becomes (key, salt), so one
    * hot key spreads over `salt` partitions instead of one. Result is
    * row-identical to `fact.join(dim, keys)` — the salt only changes
    * the partitioning.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val factS = fact.withColumn("__salt",
      (rand(seed) * salt).cast("int"))
    val dimS = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    factS.join(dimS, keys :+ "__salt").drop("__salt")
  }

  /** Two-stage salted aggregation for algebraic aggregates over hot
    * keys: stage 1 groups by (key, salt) — spreading a hot key over
    * `salt` reducers — stage 2 merges the partials. Provide each
    * aggregate as (partial, merge) column builders, e.g.
    * count → (count(*), sum), sum(x) → (sum(x), sum).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
      partials: Seq[(Column, String)],
      merges: Seq[(Column => Column, String)],
      seed: Long = 42L): DataFrame = {
    require(partials.size == merges.size, "one merge per partial")
    val salted = df.withColumn("__salt",
      (rand(seed) * salt).cast("int"))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(merges.head._1(col(partials.head._2)).as(merges.head._2),
        merges.tail.zip(partials.tail).map { case ((m, n), (_, pn)) =>
          m(col(pn)).as(n)
        }: _*)
  }

  /** Pre-shuffle skew diagnosis: the top-`k` heaviest join/agg keys
    * with exact row counts and `share_milli = n·1000 DIV total` —
    * the report that decides whether a key needs [[saltedJoin]]/
    * [[saltedAgg]] (or AQE skew handling) BEFORE the job that would
    * have hot-spotted. One partial-aggregated count collapse plus a
    * deterministic TakeOrdered top-k (count DESC, then the key
    * columns ascending — total order, engine-independent); the
    * single-row total rides a broadcast join. Null keys count as a
    * key like any other (they hash to one partition too — null-heavy
    * columns are the classic surprise skew) and sort LAST within a
    * count tie (`asc_nulls_last` — SQL engines' default ASC order, so
    * the top-k cut replays identically everywhere).
    */
  def keyProfile(df: DataFrame, keyCols: Seq[String], k: Int = 20)
      : DataFrame = {
    require(keyCols.nonEmpty, "keyProfile needs at least one key col")
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    // total from the (key-cardinality-sized) counts frame — a second
    // df.agg(count) would re-scan the full input just for one number
    val total = counts
      .agg(coalesce(sum("n_rows"), lit(0L)).as("__total"))
    val ordered = counts.crossJoin(broadcast(total))
      .withColumn("share_milli",
        expr("n_rows * 1000 DIV greatest(__total, 1)"))
      .drop("__total")
      .orderBy(col("n_rows").desc +:
        keyCols.map(col(_).asc_nulls_last): _*)
    ordered.limit(k)
  }
}
