package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-fitted character-bigram language model for quality scoring —
  * the CCNet-style "does this look like the reference corpus" filter
  * of an LLM data pipeline, kept engine-replayable by scoring in
  * EXACT INTEGER micro-probabilities instead of floating-point log
  * space (ln differs in the last ulp across libms; a ratio of int64s
  * under truncating division does not — the same discipline as the
  * tfidf oracle's rational idf).
  *
  * Model: add-one-smoothed next-char probability
  * `p(c|prev) = (count(prev,c) + 1) / (count(prev,*) + V)` with
  * V = distinct next-chars in the fit corpus + 1 (the unseen bucket).
  * Score: per position, `micro_p = ((count+1) * 1e9) DIV (tot + V)`;
  * per doc the exact int64 sum and the position count (callers derive
  * the average in one rounded projection) — low average next-char
  * probability = text unlike the corpus (mojibake, binary spew,
  * wrong language).
  *
  * 100 TB shape: the FIT is one partial-aggregated `groupBy` over
  * bigrams (shuffle is O(distinct bigrams) — alphabet-bounded, NOT
  * corpus-bounded, thanks to map-side combine); the SCORE is
  * map-only — the counts table broadcasts (natural-text alphabets
  * keep it in the low MBs) and each task streams its documents once.
  * Nothing driver-side scales with the corpus.
  */
object CharLm {

  /** Fitted model: bigram counts, per-prefix totals, smoothing V. */
  final case class Model(bigram: Map[String, Long],
      prevTot: Map[String, Long], vocab: Long)

  /** Distinct-bigram cap for the driver-side collect: natural-text
    * corpora sit far below this (alphabet², heavy-tailed); a corpus
    * of adversarial binary could exceed it, so the fit FAILS FAST
    * rather than silently truncating the model.
    */
  val MaxBigrams: Int = 1 << 22

  /** Fit bigram counts over `textCol`. One aggregation pass: explode
    * each document's length-2 substrings (codegen'd expressions, no
    * kernel), count by bigram with map-side combine.
    */
  def fit(df: DataFrame, textCol: String): Model = {
    val counts = df
      .filter(length(col(textCol)) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, length($textCol) - 1), " +
          s"i -> substring($textCol, i, 2))")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .collect()
    require(counts.length <= MaxBigrams,
      s"CharLm.fit: ${counts.length} distinct bigrams exceeds " +
        s"$MaxBigrams — not a natural-text corpus")
    val bigram = counts.map(r => r.getString(0) -> r.getLong(1)).toMap
    val prevTot = bigram.groupMapReduce(_._1.substring(0, 1))(_._2)(_ + _)
    val vocab = bigram.keysIterator.map(_.substring(1)).toSet.size + 1L
    Model(bigram, prevTot, vocab)
  }

  val scoreSchema: StructType = StructType(Seq(
    StructField("n_positions", LongType),
    StructField("sum_micro_p", LongType)))

  /** Score each document against a fitted model: map-only, the model
    * rides the closure (Spark broadcasts task binaries; for very
    * large models pass an explicit `sparkContext.broadcast`). Docs
    * shorter than 2 chars score null. Iterates CODE POINTS, matching
    * SQL `substring` semantics on supplementary characters.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(Seq(df.schema.fields(ii)) ++
      scoreSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii)
        val text = r.getString(ti)
        val cps: Array[Int] =
          if (text == null) Array.empty else text.codePoints().toArray
        if (cps.length < 2) Row(id, null, null)
        else {
          var sum = 0L
          var i = 0
          val sb = new java.lang.StringBuilder(4)
          while (i < cps.length - 1) {
            sb.setLength(0)
            sb.appendCodePoint(cps(i))
            val prev = sb.toString
            sb.appendCodePoint(cps(i + 1))
            val bg = sb.toString
            val cnt = model.bigram.getOrElse(bg, 0L)
            val tot = model.prevTot.getOrElse(prev, 0L)
            sum += ((cnt + 1L) * 1000000000L) / (tot + model.vocab)
            i += 1
          }
          Row(id, (cps.length - 1).toLong, sum)
        }
      }
    }(enc)
  }
}
