package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQ8 scalar quantization — the 4×-memory-reduction companion to
  * product quantization: each dimension maps through its own uniform
  * affine grid to one byte (0..255), so a 64-dim float32 vector
  * becomes 64 code bytes scanned sequentially at serving time.
  *
  * Exactness discipline: everything runs on the library's milli-unit
  * integer representation ([[Similarity.quantize]]), so the fitted
  * per-dimension min/max are exact int64s and the code assignment is
  * pure integer arithmetic — `((v − min) · 255) DIV span` — with no
  * doubles anywhere in fit or encode. A DuckDB oracle rebuilds the
  * identical grid from scratch.
  *
  * 100 TB shape: the fit is one per-partition fold (a 2×dim int64
  * state per task, |partitions| rows to the driver — never data-
  * proportional); encode is a map-only projection; search scans the
  * codes with an integer dot product for candidates, then reranks
  * only the candidate set against the full-precision vectors —
  * the standard codes-scan + gather-rerank serving design.
  */
object ScalarQuant {

  /** Fitted per-dimension grid (milli-unit int64 min and span). */
  final case class SqModel(mins: Array[Long], spans: Array[Long]) {
    def dim: Int = mins.length
  }

  /** Fit per-dimension min/max over the corpus: per-partition fold,
    * driver merge of |partitions| tiny rows.
    */
  def fit(df: DataFrame, vecCol: String): SqModel = {
    val schema = StructType(Seq(
      StructField("mins", ArrayType(LongType)),
      StructField("maxs", ArrayType(LongType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val partials = df
      .select(Similarity.quantize(col(vecCol)).as("q"))
      .mapPartitions { it =>
        var mins: Array[Long] = null
        var maxs: Array[Long] = null
        it.foreach { r =>
          val v = r.getSeq[Long](0)
          if (mins == null) {
            mins = v.toArray
            maxs = v.toArray
          } else {
            var i = 0
            while (i < mins.length) {
              if (v(i) < mins(i)) mins(i) = v(i)
              if (v(i) > maxs(i)) maxs(i) = v(i)
              i += 1
            }
          }
        }
        if (mins == null) Iterator.empty
        else Iterator.single(Row(mins.toSeq, maxs.toSeq))
      }(enc)
      .collect()
    require(partials.nonEmpty, "ScalarQuant.fit: empty corpus")
    val mins = partials.head.getSeq[Long](0).toArray
    val maxs = partials.head.getSeq[Long](1).toArray
    partials.tail.foreach { r =>
      val pm = r.getSeq[Long](0)
      val px = r.getSeq[Long](1)
      var i = 0
      while (i < mins.length) {
        if (pm(i) < mins(i)) mins(i) = pm(i)
        if (px(i) > maxs(i)) maxs(i) = px(i)
        i += 1
      }
    }
    SqModel(mins, maxs.zip(mins).map { case (x, n) => x - n })
  }

  /** All-integer code assignment `((q_i − min_i) · 255) DIV span_i`
    * (degenerate dimensions code to 0); truncating division like SQL
    * `DIV`/`//` on the non-negative operands.
    */
  private def codeOf(q: Seq[Long], m: SqModel): Array[Long] = {
    val out = new Array[Long](m.dim)
    var i = 0
    while (i < out.length) {
      if (m.spans(i) != 0L)
        out(i) = ((q(i) - m.mins(i)) * 255L) / m.spans(i)
      i += 1
    }
    out
  }

  /** (id, quantized vector, codes) in one map-only kernel pass — the
    * model arrays ride the closure, O(dim) per row (an expression
    * formulation with per-element array-literal lookups costs O(dim²)
    * per row and benchmarked 5× slower).
    */
  private def withCodes(df: DataFrame, idCol: String, vecCol: String,
      m: SqModel, idName: String): DataFrame = {
    val q = df.select(col(idCol).as(idName),
      Similarity.quantize(col(vecCol)).as("__q"))
    val schema = StructType(Seq(q.schema.fields.head,
      StructField("__q", ArrayType(LongType)),
      StructField("codes", ArrayType(LongType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    q.mapPartitions { it =>
      it.map { r =>
        val qv = r.getSeq[Long](1)
        Row(r.get(0), qv, codeOf(qv, m).toSeq)
      }
    }(enc)
  }

  /** Encode vectors to SQ8 codes (array&lt;long&gt; of 0..255 values;
    * byte-narrow at the storage boundary). Map-only.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      m: SqModel): DataFrame =
    withCodes(df, idCol, vecCol, m, idCol)
      .select(col(idCol), col("codes"))

  /** Two-stage SQ8 top-k: (1) candidate scan — integer dot product
    * over the code grid, widest `rerank` candidates per query;
    * (2) exact rerank — the candidate set joins back to the full-
    * precision vectors and ranks by exact quantized cosine. Queries
    * broadcast; the rerank gather touches only candidates.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, m: SqModel, k: Int, rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1")
    import org.apache.spark.sql.expressions.Window
    val c = withCodes(corpus, idCol, vecCol, m, "neighbor_id")
      .withColumnRenamed("__q", "__cv")
      .withColumnRenamed("codes", "__cc")
    val q = withCodes(queries, idCol, vecCol, m, "query_id")
      .withColumnRenamed("__q", "__qv")
      .withColumnRenamed("codes", "__qc")
    val coarse = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("__cdot", Similarity.dotQ(col("__qc"), col("__cc")))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("__cdot").desc, col("neighbor_id"))
    val cands = coarse
      .withColumn("__crank", row_number().over(wc))
      .filter(col("__crank") <= rerank)
    val we = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .withColumn("cosine",
        Similarity.cosineQ(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank"))
  }
}
