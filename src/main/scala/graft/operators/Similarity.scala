package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{HashFunctions => H}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the exact baseline, an
  * LSH (random-hyperplane) bucketed variant as the scale path, and
  * embedding-cosine near-dup pairs.
  *
  * Numeric portability: `quantize` maps floats to integer milli-units so
  * dot products become EXACT int64 arithmetic — bit-identical across
  * engines and partitionings (float accumulation order is not). The
  * library exposes both the float path (fast) and quantized path
  * (reproducible).
  */
object Similarity {

  /** Round each float to an integer count of 1/1000 units. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000, 0).cast("long"))

  /** Exact int64 dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Cosine similarity from quantized vectors (deterministic doubles:
    * integer dot/norms, one sqrt, one divide).
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      sqrt(dotQ(a, a).cast("double") * dotQ(b, b).cast("double"))

  /** Float-path cosine (double accumulation) — faster, engine-local. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)
    val na = aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / sqrt(na * nb)
  }

  /** Brute-force exact top-k: broadcast the (small) query side against
    * the corpus, rank per query. The corpus is scanned once and never
    * shuffled — only (query, candidate, score) rows reach the per-query
    * top-k, which AQE executes as a partial top-k (rank filter pushes
    * into the sort).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      quantized: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"))
    val sim =
      if (quantized)
        cosineQ(quantize(col("__qv")), quantize(col(vecCol)))
      else cosine(col("__qv"), col(vecCol))
    val scored = corpus.join(broadcast(q),
        col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        sim.as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: `planes` sign bits, each from a
    * deterministic pseudo-random hyperplane (component j of plane p =
    * (hash60(p:j) mod 2001 − 1000) — fixed by construction, no RNG
    * state, identical on every engine).
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec,
          array((0 until dim).map(j =>
            lit(planeComponent(p, j))): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), _ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic hyperplane component in [−1000, 1000]. */
  def planeComponent(plane: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$j".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.take(7).map("%02x".format(_)).mkString, 16)
    (h % 2001L - 1000L).toDouble
  }

  /** ANN via hyperplane buckets: candidates = corpus vectors in the
    * query's bucket (single-probe), ranked by exact cosine. Trades
    * recall for a corpus-partitionable plan: bucket assignment is a
    * per-row expression, the join is an equi-join on bucket id.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, planes: Int = 8): DataFrame = {
    val cb = corpus.withColumn("__bucket",
      hyperplaneBucket(col(vecCol), dim, planes))
    val qb = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"))
      .withColumn("__bucket",
        hyperplaneBucket(col("__qv"), dim, planes))
    val scored = cb.join(broadcast(qb), Seq("__bucket"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineQ(quantize(col("__qv")), quantize(col(vecCol)))
          .as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: bucket both sides by the
    * hyperplane LSH, all-pairs within buckets only, verify by exact
    * quantized cosine ≥ threshold. (The near-dup variant of lshTopK.)
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, planes: Int = 6): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__bucket", hyperplaneBucket(col("v"), dim, planes))
    val x = b.select(col("__bucket"), col("id").as("id_a"),
      col("v").as("va"))
    val y = b.select(col("__bucket"), col("id").as("id_b"),
      col("v").as("vb"))
    x.join(y, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineQ(quantize(col("va")), quantize(col("vb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
