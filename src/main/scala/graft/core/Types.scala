package graft.core

/** Column-kind taxonomy mirroring the reference's 5-way semantic
  * classification (reference: src/trousse/dataset.py:56-101 and
  * :316-341) re-expressed for a typed engine. On Spark, native
  * non-string types are classified directly from the schema; string
  * columns are sub-classified by castability (a CSV read with an
  * all-string schema preserves the reference's "mixed column"
  * semantics — see SURVEY.md §1.3).
  */
sealed trait ColumnKind
object ColumnKind {
  case object Numerical extends ColumnKind
  case object Bool      extends ColumnKind
  case object Str       extends ColumnKind
  case object Mixed     extends ColumnKind
  case object Other     extends ColumnKind // datetime/date/binary/…
}

/** Per-column statistics gathered by a single aggregation pass.
  *
  * @param name            column name
  * @param sparkType       DDL string of the column's Spark type
  * @param nRows           total rows in the frame
  * @param nNotNull        non-null count
  * @param nDistinct       distinct count excluding nulls (exact or HLL
  *                        approximation depending on `Inference.classify`'s
  *                        `exact` flag — the categorical heuristic only
  *                        needs approximate cardinality at scale)
  * @param hasNull         whether any null is present
  * @param isConstant      exactly one distinct value counting null as a
  *                        value (pandas `nunique(dropna=False) == 1`,
  *                        reference dataset.py:258-269) — computed
  *                        exactly via min==max, no distinct shuffle
  * @param castableToNum   count of non-null values castable to double
  *                        (strings only; equals nNotNull otherwise)
  * @param onlyZeroOne     non-null value set ⊆ {0,1,true,false}
  */
final case class ColumnStats(
    name: String,
    sparkType: String,
    nRows: Long,
    nNotNull: Long,
    nDistinct: Long,
    hasNull: Boolean,
    isConstant: Boolean,
    castableToNum: Long,
    onlyZeroOne: Boolean
) {
  def nNull: Long      = nRows - nNotNull
  def nanRatio: Double = if (nRows == 0) 0.0 else nNull.toDouble / nRows
}

/** Result of classifying a whole DataFrame: the Spark-native port of the
  * reference's `_ColumnListByType` (dataset.py:104-135). All sets are
  * column-name sets; thresholds match reference settings.py exactly
  * (CATEG_COL_THRESHOLD=300, categorical iff nunique<7 or
  * nunique < notNullCount/300 — dataset.py:493-535).
  */
final case class ColumnClassification(
    stats: Map[String, ColumnStats],
    kinds: Map[String, ColumnKind],
    categoricalCols: Set[String],
    constantCols: Set[String],
    mixedCols: Set[String]
) {
  import ColumnKind._
  def numericalCols: Set[String] =
    kinds.collect { case (c, Numerical) => c }.toSet
  def boolCols: Set[String]  = kinds.collect { case (c, Bool) => c }.toSet
  def strCols: Set[String]   = kinds.collect { case (c, Str) => c }.toSet
  def otherCols: Set[String] = kinds.collect { case (c, Other) => c }.toSet
  def strCategoricalCols: Set[String] = categoricalCols & strCols
  def numCategoricalCols: Set[String] = categoricalCols & numericalCols
  /** NaN-heavy columns (reference dataset.py:232-256). */
  def nanCols(ratio: Double): Set[String] =
    stats.collect { case (c, s) if s.nanRatio > ratio => c }.toSet
  /** trivial = almost-all-NaN ∪ constant (reference dataset.py:271-285). */
  def trivialCols: Set[String] = nanCols(0.999) | constantCols
  /** mixed columns are the repair targets (dataset.py:537-547). */
  def toBeFixedCols: Set[String] = mixedCols
}

object Thresholds {
  /** reference settings.py:9 */
  val CategColThreshold = 300
  /** reference dataset.py:528-530: nunique < 7 */
  val CategUniqueMax = 7
  /** reference settings.py:18 */
  val NumericCastableRatio = 0.4
  /** reference settings.py:19 — ±2% adjustment for `>x` / `<x` values */
  val OutOfScalePct = 0.02
}
