package graft.core

import graft.operators.FeatureOperation

/** Append-only lineage ledger: the Spark-native port of the reference's
  * `OperationsList` (reference: src/trousse/operations_list.py:11-193).
  * Pure driver-side immutable data — never part of the Spark plan.
  */
final case class OperationsList(
    ops: Vector[FeatureOperation] = Vector.empty,
    byColumn: Map[String, Vector[FeatureOperation]] = Map.empty
) {

  /** Append an op, indexing it under every source and derived column
    * (reference operations_list.py:170-180).
    */
  def :+(op: FeatureOperation): OperationsList = {
    val touched = (op.columns ++ op.derivedColumns).distinct
    val idx = touched.foldLeft(byColumn) { (m, c) =>
      m.updated(c, m.getOrElse(c, Vector.empty) :+ op)
    }
    OperationsList(ops :+ op, idx)
  }

  def apply(i: Int): FeatureOperation            = ops(i)
  def forColumn(c: String): Vector[FeatureOperation] =
    byColumn.getOrElse(c, Vector.empty)

  /** Forward lineage: columns derived (directly) from `c`
    * (reference operations_list.py:16-36).
    */
  def derivedColumnsFrom(c: String): Vector[String] =
    forColumn(c).filter(_.columns.contains(c)).flatMap(_.derivedColumns)

  /** Ops that produced `c` as a derived column (operations_list.py:38-57). */
  def operationsFromDerived(c: String): Vector[FeatureOperation] =
    forColumn(c).filter(_.derivedColumns.contains(c))

  /** Ops that consumed `c` as a source column (operations_list.py:59-81). */
  def operationsFromOriginal(c: String): Vector[FeatureOperation] =
    forColumn(c).filter(_.columns.contains(c))

  /** Backward lineage; errors on 0 or >1 producers like the reference
    * (operations_list.py:83-116, exceptions.py:4-35).
    */
  def originalColumnsFromDerived(c: String): Seq[String] = {
    val producers = operationsFromDerived(c)
    if (producers.isEmpty)
      throw new OperationNotFoundException(
        s"no operation produced column '$c'")
    if (producers.size > 1)
      throw new MultipleOperationsFoundException(
        s"multiple operations produced column '$c'")
    producers.head.columns
  }

  def size: Int = ops.size
}
