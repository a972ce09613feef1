package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill nulls in one column with a constant, in place or into a derived
  * column (reference: src/trousse/feature_operations.py:141-250).
  */
final case class FillNA(
    columns: Seq[String],
    value: Any,
    derivedColumns: Seq[String] = Seq.empty
) extends FeatureOperation {
  require(columns.size == 1, "FillNA operates on exactly one column")
  require(derivedColumns.isEmpty || derivedColumns.size == 1,
    "FillNA derives at most one column")

  protected def transform(df: DataFrame): DataFrame = {
    val src    = columns.head
    val target = derivedColumns.headOption.getOrElse(src)
    df.withColumn(target, coalesce(col(src), lit(value)))
  }
}

/** Replace each substring occurrence per a map, SEQUENTIALLY in map
  * order — later patterns see earlier replacements (reference:
  * feature_operations.py:302-326). The map is a Seq of pairs, never an
  * unordered Map (SURVEY.md §7.4 risk 3). Patterns are literal strings
  * (reference settings.py:40 intent), hence Pattern.quote.
  *
  * Non-string policy: pandas `.str.replace` yields NaN for non-string
  * values; on an already-string Spark column this is a no-op policy.
  */
final case class ReplaceSubstrings(
    columns: Seq[String],
    replacements: Seq[(String, String)],
    derivedColumns: Seq[String] = Seq.empty
) extends FeatureOperation {
  require(columns.size == 1, "ReplaceSubstrings operates on one column")

  protected def transform(df: DataFrame): DataFrame = {
    val src    = columns.head
    val target = derivedColumns.headOption.getOrElse(src)
    val replaced = replacements.foldLeft(col(src)) {
      case (e, (pat, rep)) =>
        regexp_replace(e, Pattern.quote(pat), Matcher.quoteReplacement(rep))
    }
    df.withColumn(target, replaced)
  }
}

/** Whole-value replacement per map, exact match only (reference:
  * feature_operations.py:443-468 — subclass of ReplaceSubstrings there,
  * independent here because the Spark plans differ: value replacement is
  * a when-chain / na.replace, not a regexp).
  */
final case class ReplaceStrings(
    columns: Seq[String],
    replacements: Seq[(String, String)],
    derivedColumns: Seq[String] = Seq.empty
) extends FeatureOperation {
  require(columns.size == 1, "ReplaceStrings operates on one column")

  protected def transform(df: DataFrame): DataFrame = {
    val src    = columns.head
    val target = derivedColumns.headOption.getOrElse(src)
    val c      = col(src)
    val replaced = replacements.foldLeft(c) {
      case (e, (from, to)) => when(c === lit(from), lit(to)).otherwise(e)
    }
    df.withColumn(target, replaced)
  }
}

/** Cast boolean columns to 0/1 integers (reference:
  * feature_fix.py:400-422 `convert_features_from_bool_to_binary`).
  */
final case class BoolToBinary(columns: Seq[String])
    extends FeatureOperation {
  def derivedColumns: Seq[String] = Seq.empty
  protected def transform(df: DataFrame): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("int")))
}

/** Drop columns (reference: anonymize_database.py:80,194). */
final case class DropColumns(columns: Seq[String])
    extends FeatureOperation {
  def derivedColumns: Seq[String] = Seq.empty
  protected def transform(df: DataFrame): DataFrame =
    df.drop(columns: _*)
}
