package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two corpus snapshots — the pre-accept gate
  * for recurring ingests at DOCUMENT granularity, complementing the
  * stats-level [[ColumnStats]] drift reports: which ids appeared,
  * which vanished, which changed content in place.
  *
  * Scale shape: each side projects to `(id, 8-byte xxhash64 content
  * fingerprint)` BEFORE the join, so the full-outer exchange ships
  * ~16 bytes/row instead of documents — the only data-proportional
  * shuffle two unaligned 100 TB snapshots fundamentally need. Ingest
  * both snapshots bucketed by id and even that exchange disappears
  * (see [[graft.sources.Io]] bucketed writes). Status comes from
  * hash equality: a changed row escaping detection needs an xxhash64
  * collision on the SAME id (~2⁻⁶⁴ per changed row) — the standard
  * content-addressing trade, same as [[Dedup.byFingerprint]].
  */
object Snapshot {

  /** `(idCol, status)` for every id in either snapshot, with status ∈
    * {added, removed, changed, unchanged}: added = only in `newDf`,
    * removed = only in `oldDf`, changed = in both with differing
    * `contentCols` fingerprints. The fingerprint interleaves each
    * column with its null flag before `xxhash64` — plain xxhash64
    * SKIPS null inputs, so `(x, null)` and `(null, x)` would hash
    * identically and a value moving between columns would escape as
    * "unchanged"; the flags make null POSITIONS part of the hash
    * while all-null rows still compare unchanged against each other.
    *
    * Ids must be unique per snapshot (a keyed corpus contract — the
    * same contract every dedup/join operator here relies on);
    * duplicate ids would multiply through the full-outer join.
    */
  def contentDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def fp(df: DataFrame, fpAs: String): DataFrame =
      df.select(col(idCol).as("id"),
        xxhash64(contentCols.flatMap(c =>
          Seq(col(c), col(c).isNull)): _*).as(fpAs))
    fp(oldDf, "__ofp")
      .join(fp(newDf, "__nfp"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") =!= col("__nfp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The four status counts in one row — absent statuses at 0, so the
    * output shape is fixed for monitoring sinks regardless of the
    * diff's content.
    */
  def contentDiffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCols: Seq[String]): DataFrame =
    contentDiff(oldDf, newDf, idCol, contentCols)
      .agg(
        count(when(col("status") === "added", 1)).as("n_added"),
        count(when(col("status") === "removed", 1)).as("n_removed"),
        count(when(col("status") === "changed", 1)).as("n_changed"),
        count(when(col("status") === "unchanged", 1))
          .as("n_unchanged"))
}
