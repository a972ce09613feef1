package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * by payload-struct order (deterministic on any engine).
  *
  * Hot keys: the per-key window serializes a key into ONE task. For a
  * documented pathological key (one user holding a large share of the
  * rows), pass `splitParts` > 1 — the union is then RANGE-partitioned
  * by (key, time), each range runs its own local carry window in
  * parallel, and the cross-partition carry is stitched with
  * driver-computed boundary payloads (one row per partition, the
  * [[ColumnStats]] prefix-offset pattern applied to "last non-null
  * payload" instead of a running sum). Two shuffles instead of one,
  * any single key spread over up to `splitParts` tasks, identical
  * results.
  */
object AsofJoin {

  private val Internal =
    Set("__ts", "__side", "__p", "__m", "__pid", "__bk", "__bp")

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
    * @param splitParts 0/1 (default): one window task per key;
    *                 > 1: range-split hot keys over this many
    *                 partitions (see object doc)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean = false, splitParts: Int = 0): DataFrame = {
    require(keys.nonEmpty, "asof needs at least one key column")
    require(payload.nonEmpty, "asof needs at least one payload column")
    payload.foreach(p => require(!left.columns.contains(p),
      s"payload column '$p' collides with a left column"))
    val clash = left.columns.toSet.intersect(Internal)
    require(clash.isEmpty,
      s"left columns ${clash.mkString(", ")} collide with asof's " +
      "internal working columns — rename them first")
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
    val finish = (d: DataFrame) => d
      .filter(col("__side") === leftSide)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col("__m").getField(p).as(p)): _*)
    if (splitParts <= 1) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__ts"), col("__side"), col("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      finish(u.withColumn("__m",
        last(col("__p"), ignoreNulls = true).over(w)))
    } else finish(rangeSplit(u, keys, splitParts))
  }

  /** The hot-key path: local carry per (key, time)-range partition +
    * driver-stitched cross-partition boundaries.
    */
  private def rangeSplit(u: DataFrame, keys: Seq[String], parts: Int)
      : DataFrame = {
    val spark = u.sparkSession
    val keyStruct = struct(keys.map(col): _*)
    // pid must be STABLE across the stats pass and the window pass —
    // repartitionByRange samples its boundaries, so an uncheckpointed
    // recompute could land rows in different partitions per consumer
    val parted = u
      .repartitionByRange(parts,
        keys.map(col) :+ col("__ts") :+ col("__side"): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // per-partition digest, ONE row per partition: key range + the
    // latest right row of the partition's top key (if any). The max
    // struct orders by (key, ts, side, payload) — the window order
    // within a key — so its payload is exactly the value a local
    // carry would end the partition with.
    val stats = parted.groupBy("__pid").agg(
        min(keyStruct).as("kmin"), max(keyStruct).as("kmax"),
        max(when(col("__p").isNotNull,
          struct(keyStruct.as("k"), col("__ts").as("t"),
            col("__side").as("s"), col("__p").as("p")))).as("lastr"))
      .collect()
      .map(r => r.getInt(0) -> (r.getStruct(1), r.getStruct(2),
        Option(r.getStruct(3)))).toMap
    // prefix scan on the driver (≤ `parts` entries): a partition whose
    // first key continues the previous partitions' last key inherits
    // that key's carried payload; every later key-run STARTS inside
    // this partition, so a null local carry is genuinely "no match".
    var carryKey: Row = null
    var carryP: Row = null
    val bounds = Vector.newBuilder[Row]
    (0 until parts).foreach { pid =>
      stats.get(pid).foreach { case (kmin, kmax, lastr) =>
        if (carryP != null && carryKey == kmin)
          bounds += Row(pid, kmin, carryP)
        val newP: Row = lastr match {
          case Some(lr) if lr.getStruct(0) == kmax =>
            lr.getStruct(3) // the top key has right rows here
          case _ if kmin == kmax && carryKey == kmax =>
            carryP          // single-key partition, carry flows through
          case _ => null    // top key's run starts here: nothing to carry
        }
        carryKey = kmax
        carryP = newP
      }
    }
    val boundRows = bounds.result()
    val keyType = StructType(keys.map(k => parted.schema(k)))
    val boundsSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__bk", keyType),
      org.apache.spark.sql.types.StructField("__bp",
        parted.schema("__p").dataType)))
    import scala.jdk.CollectionConverters._
    val boundsDf = spark.createDataFrame(boundRows.asJava, boundsSchema)
    // per (range id, key): the carry must RESET at key changes inside
    // a partition — partitioning by pid alone would leak one key's
    // payload into the next key's early rows
    val localW = Window.partitionBy(col("__pid") +: keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(localW))
      .join(broadcast(boundsDf), Seq("__pid"), "left")
      .withColumn("__m", coalesce(col("__m"),
        when(keyStruct === col("__bk"), col("__bp"))))
  }
}
