package graft.operators

import org.apache.spark.sql.DataFrame
import graft.core.GraftDataset

/** Composable, lineage-tracked column transformation — the Spark port of
  * the reference's `FeatureOperation` ABC (reference:
  * src/trousse/feature_operations.py:15-98). The template method there is
  * deepcopy → `_apply` → `track_history`; here the deepcopy vanishes
  * (DataFrames are immutable plans) and `apply` is transform-then-track.
  *
  * Implementations are case classes: value equality (the reference hand
  * writes `__eq__` per op, feature_operations.py:210-233 etc.) comes for
  * free, and every op serializes to JSON for dataset persistence.
  *
  * Ops must be pure plan builders: no Spark actions except where the
  * output schema is data-dependent (encoders collect their dictionary —
  * documented on each such op).
  */
trait FeatureOperation extends Serializable with Product {

  /** Source columns (validated single-element for most ops in the
    * reference, feature_operations.py:40-87).
    */
  def columns: Seq[String]

  /** Columns this op creates; empty → in-place. Ops whose derived
    * columns are data-dependent (one-hot) report them only after
    * application.
    */
  def derivedColumns: Seq[String]

  /** Build the transformed frame. */
  protected def transform(df: DataFrame): DataFrame

  /** The op as actually applied (one-hot overrides this to return a copy
    * carrying its discovered derived columns).
    */
  protected def applied(df: DataFrame): FeatureOperation = this

  def apply(ds: GraftDataset): GraftDataset = {
    columns.foreach { c =>
      require(ds.data.columns.contains(c),
        s"${getClass.getSimpleName}: column '$c' not in dataset")
    }
    // Fit ONCE: `applied` runs any data-dependent fit and returns the op
    // copy carrying its dictionary; transforming through that copy reuses
    // it, so encoder ops run one distinct-collect job per application,
    // not two (one for the history record, one for the output frame).
    val fitted = applied(ds.data)
    val out    = fitted.transform(ds.data)
    ds.trackHistory(fitted, out)
  }

  def apply(df: DataFrame): DataFrame = transform(df)
}

/** Sequential composition — the reference's `Trousse` compose class
  * (feature_operations.py:101-138; README calls it `Compose`). Folding
  * lazily chains every op into one Catalyst plan.
  */
final case class Pipeline(ops: FeatureOperation*) extends FeatureOperation {
  def columns: Seq[String]        = ops.flatMap(_.columns).distinct
  def derivedColumns: Seq[String] = ops.flatMap(_.derivedColumns).distinct
  protected def transform(df: DataFrame): DataFrame =
    ops.foldLeft(df)((d, op) => op(d))
  override def apply(ds: GraftDataset): GraftDataset =
    ops.foldLeft(ds)((d, op) => op(d))
}
