package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-store lookup Spark has no
  * built-in operator for: every left row is matched with the LATEST
  * right row whose time is ≤ (or <, when `strict`) the left row's
  * time, per key. The classic uses: join events to the most recent
  * preceding dimension snapshot, label training examples with the
  * feature values as they were AT event time (no leakage from the
  * future).
  *
  * Implementation is deliberately JOIN-FREE: both sides are tagged and
  * unioned, ONE window partitioned by key and ordered by
  * (time, side, payload) computes `last(payload, ignoreNulls)` over a
  * rows-frame up to the current row, and left rows read off the
  * carried struct. One shuffle on the key, one in-partition sort —
  * same cost as a groupBy, where a range-join formulation would
  * explode to candidate pairs and a broadcast formulation would need
  * the whole right side on every executor. Ties on right time resolve
  * by payload-struct order (deterministic on any engine); a hot key
  * serializes into one partition — pre-split pathological keys
  * upstream (Skew.scala) if that happens.
  */
object AsofJoin {

  /** @param left     left frame; ALL its columns are preserved
    * @param right    right frame; only `keys`, `rightTs`, `payload`
    *                 columns are read
    * @param keys     equi-join key columns (same names both sides)
    * @param leftTs   left time column (any orderable type; both sides
    *                 must use the SAME type — pass epoch micros for
    *                 engine-portable semantics)
    * @param rightTs  right time column
    * @param payload  right columns carried onto matched left rows
    *                 (names must not collide with left columns); left
    *                 rows with no match get nulls
    * @param strict   false (default): right.ts ≤ left.ts matches;
    *                 true: right.ts < left.ts only
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof needs at least one key column")
    require(payload.nonEmpty, "asof needs at least one payload column")
    payload.foreach(p => require(!left.columns.contains(p),
      s"payload column '$p' collides with a left column"))
    // at equal times the right row must be visible to the left row in
    // the non-strict form (right sorts first) and hidden in the strict
    // form (right sorts last)
    val leftSide  = if (strict) 0 else 1
    val rightSide = 1 - leftSide
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
    val r2 = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col) :+ col(rightTs).as("__ts") :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(rightSide))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
