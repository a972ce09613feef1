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
}
