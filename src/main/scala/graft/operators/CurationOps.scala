package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** The corpus-curation transforms as lineage-tracked
  * [[FeatureOperation]]s, so pipelines that adopt the curation surface
  * keep the reference's history/persistence contract (track_history,
  * operations lookup, dataset round-trip) over it — a curation step is
  * then as auditable as an encoder fit. Case classes of plain values:
  * value equality and Java/JSON serialization come with the trait.
  */

/** Mask emails / IPv4s / phone runs in `column` (in place, or into the
  * single derived column).
  */
final case class RedactPii(
    columns: Seq[String],
    derivedColumns: Seq[String] = Seq.empty
) extends FeatureOperation {
  require(columns.size == 1, "RedactPii operates on exactly one column")
  require(derivedColumns.size <= 1, "RedactPii derives at most one column")

  protected def transform(df: DataFrame): DataFrame = {
    val target = derivedColumns.headOption.getOrElse(columns.head)
    df.withColumn(target, T.redactPii(col(columns.head)))
  }
}

/** Append `<col>_keep` / `<col>_reasons` quality columns for the text
  * in `column` using [[graft.functions.TextFunctions
  * .defaultQualityRules]]. Annotation, not deletion: the drop decision
  * (and its audit) stays with the caller, mirroring the reference's
  * report-then-repair split.
  */
final case class AnnotateQuality(
    columns: Seq[String]
) extends FeatureOperation {
  require(columns.size == 1,
    "AnnotateQuality operates on exactly one column")
  def derivedColumns: Seq[String] =
    Seq(s"${columns.head}_keep", s"${columns.head}_reasons")

  protected def transform(df: DataFrame): DataFrame = {
    val c = columns.head
    df.withColumn(s"${c}_keep", T.qualityKeep(col(c)))
      .withColumn(s"${c}_reasons", T.qualityReasons(col(c)))
  }
}

/** Append a deterministic `split` assignment keyed on the id in
  * `column` (see [[Sampling.deterministicSplit]]): the split a row gets
  * is part of the dataset's recorded lineage, so a training run can
  * prove which rows were holdout.
  */
final case class AssignSplit(
    columns: Seq[String],
    splits: Seq[(String, Double)],
    splitCol: String = "split"
) extends FeatureOperation {
  require(columns.size == 1, "AssignSplit operates on exactly one column")
  def derivedColumns: Seq[String] = Seq(splitCol)

  protected def transform(df: DataFrame): DataFrame =
    Sampling.deterministicSplit(df, columns.head, splits, splitCol)
}
