package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraftDataset, Inference, Thresholds}
import graft.functions.SafeCast

/** The data-repair cascade (reference: src/trousse/row_fix.py).
  *
  * The reference repairs one value at a time with per-row Python
  * `.apply` — its slowest path (row_fix.py:219-225). Here the whole
  * cascade compiles to ONE nested `when/otherwise` Catalyst expression
  * tree per column: fully whole-stage-codegen'd, no UDF, executed in the
  * same projection as everything else.
  *
  * Cascade per value (row_fix.py:137-190, order preserved):
  *   1. plain cast to double;
  *   2. char-map repair (`°`→delete, `,`→`.` — settings.py:40) then cast;
  *   3. value contains `%` → null (percentages carry no absolute value);
  *   4. `>x` → x·(1+0.02), `<x` → x·(1−0.02) (settings.py:19) — applied
  *      on the char-repaired string;
  *   5. whole-word map (settings.py:25-37) → null;
  *   6. give up → null in the typed output, with the failure recorded in
  *      a companion audit flag column (the reference keeps the raw value
  *      in an object column — impossible in a typed engine; the audit
  *      frame preserves the information instead).
  */
object RowFix {

  /** settings.py:25-37 — every value maps to None. */
  val WholeWordNullTokens: Seq[String] = Seq(
    "---", ".", "ASSENTI", "PRESENTI", "non disponibile", "NV", "-",
    "Error", "None", "NAN")

  /** char-repaired view of the raw string: `,`→`.`, `°` deleted. */
  private def charFixed(c: Column): Column = translate(c, ",°", ".")

  /** The repair expression for one string column → double. */
  def fixExpr(c: Column): Column = {
    val asNum  = SafeCast.tryCastDouble(c)
    val rep    = charFixed(c)
    val repNum = SafeCast.tryCastDouble(rep)
    val up     = lit(1.0 + Thresholds.OutOfScalePct)
    val down   = lit(1.0 - Thresholds.OutOfScalePct)
    val gtVal  = SafeCast.tryCastDouble(regexp_replace(rep, ">", "")) * up
    val ltVal  = SafeCast.tryCastDouble(regexp_replace(rep, "<", "")) * down
    when(c.isNull, lit(null).cast("double"))
      .when(asNum.isNotNull, asNum)
      .when(repNum.isNotNull, repNum)
      .when(rep.contains("%"), lit(null).cast("double"))
      .when(rep.contains(">"), gtVal)
      .when(rep.contains("<"), ltVal)
      .otherwise(lit(null).cast("double")) // word map + unfixable → null
  }

  /** True where the cascade exhausted every repair (row_fix.py:182-187):
    * these are the `errors_after_correction` values.
    */
  def unfixableExpr(c: Column): Column = {
    val rep = charFixed(c)
    c.isNotNull &&
    SafeCast.tryCastDouble(c).isNull &&
    SafeCast.tryCastDouble(rep).isNull &&
    !rep.contains("%") && !rep.contains(">") && !rep.contains("<") &&
    !trim(rep).isin(WholeWordNullTokens: _*)
  }

  /** True where the raw value fails a plain float cast — the
    * `errors_before_correction` audit (row_fix.py:94-115).
    */
  def errorBeforeExpr(c: Column): Column =
    c.isNotNull && SafeCast.tryCastDouble(c).isNull

  /** Which string columns are "actually numeric": castable ratio > 0.4
    * (reference row_fix.py:20-53 + settings.py:18). Uses the
    * classification's fused single-pass stats — no extra scans.
    */
  def numericIshStringCols(ds: GraftDataset): Seq[String] = {
    val cls = ds.classification
    ds.data.columns.toSeq.filter { c =>
      cls.stats.get(c).exists { s =>
        s.sparkType == "STRING" && s.nNotNull > 0 &&
        s.castableToNum.toDouble / s.nNotNull >
          Thresholds.NumericCastableRatio &&
        s.castableToNum < s.nNotNull // fully castable needs no fixing
      }
    }
  }

  /** A6 (reference row_fix.py:41-46): the DISTINCT values a plain
    * numeric cast would lose — non-null before, null after. This is the
    * set a data cleaner actually inspects; one column-pruned scan with
    * a bounded-by-distinct aggregation.
    */
  def lostValues(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull &&
        SafeCast.tryCastDouble(col(column)).isNull)
      .groupBy(col(column).cast("string").as("value"))
      .agg(count(lit(1)).as("n"))

  /** R8 (reference row_fix.py:311-338): per-value error report — every
    * offending value with its count, before ("before" = fails a plain
    * cast) and after ("after" = survives the whole cascade unfixed)
    * repair. One aggregation per phase per column, all column-pruned.
    */
  def errorReport(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "errorReport needs at least one column")
    val frames = columns.flatMap { c =>
      Seq(
        df.filter(errorBeforeExpr(col(c)))
          .groupBy(col(c).cast("string").as("value"))
          .agg(count(lit(1)).as("n"))
          .select(lit(c).as("column"), lit("before").as("phase"),
            col("value"), col("n")),
        df.filter(unfixableExpr(col(c)))
          .groupBy(col(c).cast("string").as("value"))
          .agg(count(lit(1)).as("n"))
          .select(lit(c).as("column"), lit("after").as("phase"),
            col("value"), col("n")))
    }
    frames.reduce(_ unionByName _)
  }

  /** Repair the given columns in one projection; returns the repaired
    * frame plus an audit frame `(column, errors_before, errors_after)`
    * computed in one aggregation (replacing the reference's Python-side
    * error dicts, row_fix.py:216-225,322-338).
    */
  def fixTypos(df: DataFrame, columns: Seq[String])
      : (DataFrame, DataFrame) = {
    val fixed = df.select(df.columns.map { c =>
      if (columns.contains(c)) fixExpr(col(c)).as(c) else col(c)
    }.toIndexedSeq: _*)
    val audit =
      if (columns.isEmpty) df.sparkSession.emptyDataFrame
      else {
        val perCol = columns.zipWithIndex.map { case (c, i) =>
          struct(
            lit(c).as("column"),
            count(when(errorBeforeExpr(col(c)), 1)).as("errors_before"),
            count(when(unfixableExpr(col(c)), 1)).as("errors_after")
          ).as(s"__audit_$i")
        }
        df.agg(perCol.head, perCol.tail: _*)
          .select(explode(array(
            columns.indices.map(i => col(s"__audit_$i")): _*)).as("a"))
          .select(col("a.column"), col("a.errors_before"),
            col("a.errors_after"))
      }
    (fixed, audit)
  }

  /** R2/R6 dtype completion: cast repaired DOUBLE columns back to the
    * smallest integer type that represents every value exactly —
    * ShortType / IntegerType / LongType — mirroring pandas' nullable
    * Int16/Int32/Int64 down-conversion in the reference's dtype
    * normalization (row_fix.py:56-91). A column stays double when any
    * value has a fractional part (or is ±Inf/NaN — those fail the range
    * gates), or when it is all-null (no evidence either way). One fused
    * aggregation decides every column; one projection applies the
    * casts.
    */
  def castBackIntegers(df: DataFrame, columns: Seq[String]): DataFrame = {
    val doubles = columns.filter(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
    if (doubles.isEmpty) return df
    val aggs = doubles.flatMap(c => Seq(
      count(when(col(c) =!= floor(col(c)) || col(c).isNaN, 1))
        .as(s"__frac_$c"),
      min(col(c)).as(s"__min_$c"),
      max(col(c)).as(s"__max_$c"),
      count(col(c)).as(s"__n_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val target: Map[String, String] = doubles.flatMap { c =>
      if (r.getAs[Long](s"__frac_$c") > 0 ||
          r.getAs[Long](s"__n_$c") == 0L) None
      else {
        val lo = r.getAs[Double](s"__min_$c")
        val hi = r.getAs[Double](s"__max_$c")
        if (lo >= Short.MinValue && hi <= Short.MaxValue)
          Some(c -> "smallint")
        else if (lo >= Int.MinValue && hi <= Int.MaxValue)
          Some(c -> "int")
        // 2^53: beyond it a double no longer holds every integer
        else if (lo >= -9007199254740992.0 && hi <= 9007199254740992.0)
          Some(c -> "bigint")
        else None
      }
    }.toMap
    if (target.isEmpty) df
    else df.select(df.columns.map { c =>
      target.get(c) match {
        case Some(t) => col(c).cast(t).as(c)
        case None    => col(c)
      }
    }.toIndexedSeq: _*)
  }

  /** End-to-end `fix_common_errors` (row_fix.py:269-309): classify,
    * pick mixed ∪ numeric-ish string columns, repair them, normalize
    * dtypes — {0,1}→int kept, and repaired columns whose values are all
    * whole numbers cast back to the smallest exact integer type
    * ([[castBackIntegers]], the reference's pandas Int16/Int32 path).
    */
  def fixCommonErrors(ds: GraftDataset): GraftDataset = {
    val targets =
      (ds.classification.mixedCols.toSeq ++ numericIshStringCols(ds))
        .distinct
    val (fixed, _) = fixTypos(ds.data, targets)
    ds.withData(castBackIntegers(fixed, targets))
  }
}

/** Operator wrapper so the repair participates in lineage tracking. */
final case class FixTypos(columns: Seq[String])
    extends FeatureOperation {
  def derivedColumns: Seq[String] = Seq.empty
  protected def transform(df: DataFrame): DataFrame =
    RowFix.fixTypos(df, columns)._1
}
