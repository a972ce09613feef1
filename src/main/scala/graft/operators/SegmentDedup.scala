package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level corpus curation: boilerplate removal and corpus-wide
  * exact segment dedup, where a "segment" is one piece of a document
  * under a literal separator (paragraphs under "\n\n", lines under
  * "\n", sentences under a caller-chosen delimiter). These are the
  * MassiveText/Gopher-style repetition-and-boilerplate rules applied
  * ACROSS documents — the within-document counterpart (repeated token
  * spans) lives in [[SubstringDedup]].
  *
  * Scale shape (both operators):
  *  - segments explode to (id, pos, seg) rows — the same row count a
  *    tokenize pass produces, never quadratic;
  *  - the frequency / first-occurrence decision shuffles segment text
  *    ONCE keyed by the segment itself (exact equality — no hash-only
  *    shortcut that could scrub an innocent segment on a collision);
  *  - reconstruction regroups by document id: per-doc state is
  *    bounded by that document's own segment count, exactly the bound
  *    the document's text already imposes;
  *  - the boilerplate set (segments in ≥ minDocs docs) is tiny next
  *    to the corpus, so AQE broadcasts the anti-join side and the
  *    second pass over segments never shuffles.
  *
  * Empty segments (adjacent separators) are segments like any other:
  * both operators treat them uniformly, and reconstruction is exact —
  * `split` then `join` with a literal separator is the identity when
  * nothing is removed.
  */
object SegmentDedup {

  /** (id, pos, seg) — one row per segment, `pos` = 0-based position
    * within its document. `sep` is a LITERAL separator.
    */
  private def segments(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), Pattern.quote(sep)))
        .as(Seq("pos", "seg")))

  /** Rebuild each document from kept segments in original order, then
    * restore dropped-everything documents as "" (their group vanishes
    * in the aggregate, so they come back through the left join).
    */
  private def reconstruct(df: DataFrame, idCol: String, kept: DataFrame,
      sep: String, outCol: String): DataFrame = {
    val rebuilt = kept.groupBy("id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("seg")))),
        s => s.getField("seg")), sep).as(outCol))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col(outCol), lit("")).as(outCol))
  }

  /** Remove boilerplate: every segment occurring in at least `minDocs`
    * DISTINCT documents is removed from ALL documents (the "subscribe
    * now" / license-footer rule), and each document is rebuilt from
    * its surviving segments in original order. Returns (`idCol`,
    * `outCol`).
    *
    * The document-frequency count runs over distinct (seg, id) pairs
    * — a doc repeating its own footer five times still counts once —
    * with map-side partial aggregation on both levels.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Long, outCol: String = "scrubbed")
      : DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val segs = segments(df, idCol, textCol, sep)
    val boiler = segs.select("seg", "id").distinct()
      .groupBy("seg").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("seg")
    val kept = segs.join(boiler, Seq("seg"), "left_anti")
    reconstruct(df, idCol, kept, sep, outCol)
  }

  /** Corpus-wide exact segment dedup, keep-first: every occurrence of
    * a segment except the globally first — ordered by (`idCol`, then
    * position within the document) — is removed, including repeats
    * within a single document. Returns (`idCol`, `outCol`).
    *
    * The first-occurrence pick is a rank-1 filter under a window
    * partitioned by the segment, which Spark rewrites to a
    * WindowGroupLimit: each map task pre-reduces its partition to one
    * candidate per segment BEFORE the shuffle, so a segment repeated
    * a billion times costs one surviving row per input partition, not
    * a billion-row window sort (the same plan shape
    * [[Sampling.topKPerGroup]] pins in its spec).
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      sep: String, outCol: String = "deduped"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val segs = segments(df, idCol, textCol, sep)
    val kept = segs
      .withColumn("__rn", row_number().over(
        Window.partitionBy("seg").orderBy(col("id"), col("pos"))))
      .filter(col("__rn") === 1)
      .drop("__rn")
    reconstruct(df, idCol, kept, sep, outCol)
  }
}
