package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join. Spark's planner turns a
  * raw `p BETWEEN lo AND hi` join into BroadcastNestedLoopJoin when
  * one side is small — and a near-cartesian disaster when neither is.
  * This operator makes big×big range joins an EQUI-join: the number
  * line is cut into fixed-width chunks, each point lands in its chunk,
  * each interval explodes to the chunks it overlaps, and the join runs
  * as a plain shuffled hash/sort-merge join on the chunk id with the
  * exact predicate re-checked after. Chunking is candidate generation
  * only — `floor` is monotone, so a point inside [lo, hi] always
  * shares a chunk with the interval regardless of floating-point
  * rounding; the final filter decides membership exactly.
  *
  * Cost model: interval explosion factor = ⌈(hi−lo)/chunkWidth⌉ + 1,
  * so pick `chunkWidth` near the TYPICAL interval width — a too-small
  * width multiplies the interval side, a too-large width degrades
  * candidate selectivity toward all-pairs-per-chunk. Equi-`keys`
  * (joined alongside the chunk) cut candidates further and spread hot
  * chunks.
  */
object RangeJoin {

  /** Inner-join `points` to every interval row whose [loCol, hiCol]
    * contains its `pointCol` (closed bounds), optionally also matching
    * on equi-`keys` present in both frames. Other column names must
    * not collide. Null points/bounds and empty intervals (lo > hi)
    * never match, like the raw SQL predicate.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      chunkWidth: Double, keys: Seq[String] = Seq.empty): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth must be > 0, got $chunkWidth")
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__chunk",
        floor(col(pointCol) / chunkWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__chunk", explode(sequence(
        floor(col(loCol) / chunkWidth).cast("long"),
        floor(col(hiCol) / chunkWidth).cast("long"))))
    p.join(iv, keys :+ "__chunk")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__chunk")
  }

  /** Inner-join two INTERVAL tables on closed-interval overlap
    * (`[llo, lhi] ∩ [rlo, rhi] ≠ ∅`), optionally under equi-`keys` —
    * the big×big interval-intersection primitive (time-range overlap,
    * span conflicts, genomic-style range intersection) that raw SQL
    * plans as a nested-loop disaster. Both sides explode to their
    * chunks and join on the chunk id; a pair overlapping several
    * chunks is emitted EXACTLY ONCE — only in the chunk containing
    * `max(llo, rlo)`, the overlap's start — so no distinct pass is
    * needed (the dedup is a per-row filter, not a shuffle).
    *
    * Column names must not collide across the two frames. Null bounds
    * and empty intervals (lo > hi) never match. Cost: each side
    * explodes by ⌈width/chunkWidth⌉ + 1 — pick `chunkWidth` near the
    * typical interval width, as with [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lloCol: String, lhiCol: String, rloCol: String, rhiCol: String,
      chunkWidth: Double, keys: Seq[String] = Seq.empty): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth must be > 0, got $chunkWidth")
    def chunked(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo).isNotNull && col(hi).isNotNull &&
          col(lo) <= col(hi))
        .withColumn("__chunk", explode(sequence(
          floor(col(lo) / chunkWidth).cast("long"),
          floor(col(hi) / chunkWidth).cast("long"))))
    chunked(left, lloCol, lhiCol)
      .join(chunked(right, rloCol, rhiCol), keys :+ "__chunk")
      .filter(col(lloCol) <= col(rhiCol) &&
        col(rloCol) <= col(lhiCol) &&
        col("__chunk") ===
          floor(greatest(col(lloCol), col(rloCol)) / chunkWidth)
            .cast("long"))
      .drop("__chunk")
  }
}
