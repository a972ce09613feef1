package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed statistics over embedding columns — the aggregation side
  * of the vector toolkit (Similarity covers search). Everything here is
  * exact and engine-portable: vectors quantize to int milli-units (the
  * library standard), sums are int64, and only the final mean divides —
  * so results are bit-identical on any engine and any partitioning
  * (never an accumulation-order-dependent float sum).
  */
object VectorStats {

  /** Per-group centroid in LONG form: one row per (group, dimension)
    * with the exact mean. Scalar output columns (`pos`, `centroid`,
    * `n_vectors`) keep results portable across engines and sinks —
    * array re-assembly is one `sort_array(collect_list(...))` away for
    * callers that want vectors back.
    *
    * Scale: posexplode materializes rows×dim records, but the hash
    * aggregation partial-combines map-side, so the single shuffle
    * carries at most groups×dim partial sums per task — independent of
    * corpus size.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol),
        posexplode(Similarity.quantize(col(vecCol)))
          .as(Seq("pos", "q")))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum("q").as("__sq"), count(lit(1)).as("n_vectors"))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        (col("__sq").cast("double") / (col("n_vectors") * 1000))
          .as("centroid"),
        col("n_vectors"))
}
