package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Exact substring (repeated-span) dedup — the RefinedWeb / "Deduplicating
  * Training Data Makes Language Models Better" companion to
  * document-level MinHash: detect and remove VERBATIM spans of ≥ n
  * tokens shared across documents, at n-token granularity.
  *
  * A corpus-wide suffix array (the single-node formulation) is not a
  * distributed-friendly structure; the equivalent observation that IS:
  * any repeated span of length ≥ n contains at least one repeated token
  * n-gram, so a POSITIONAL n-gram inverted index finds every such span.
  * The index rows are (gram-hash, doc-id, position) int64 triples —
  * ~24 bytes per corpus token — and every stage is a hash aggregation
  * or equi-join on the hash: corpus-token-scale shuffles of fixed-width
  * rows, never text, never quadratic. (Candidate-pair ops need
  * frequency caps; these ops don't — the repeated-gram frame is ONE row
  * per distinct hash, so joins against it match each occurrence at most
  * once.)
  *
  * Gram hashes are [[HashFunctions.stableHash60]] of the gram STRING
  * (md5-based), so any engine replays them bit-identically.
  *
  * The positional-gram pipeline is deliberately RECOMPUTED where a plan
  * references it twice (frequency derivation + position matching)
  * rather than persisted: a second tokenize+md5 scan is a stateless
  * map over the source, while caching a corpus-token-scale frame at
  * 100 TB costs cluster memory/disk and a write barrier. (Collecting
  * per-hash occurrence lists instead would compute grams once but
  * builds unbounded arrays for boilerplate grams — the exact blow-up
  * the pair ops cap against.)
  */
object SubstringDedup {

  /** Positional gram-hash index: (`id`, `pos`, `h`), `pos` 0-based over
    * [[TextFunctions.wordNGrams]] (documents shorter than n tokens
    * contribute their single truncated gram at pos 0). Hashing runs in
    * the [[graft.functions.WordGramHashes]] one-pass kernel —
    * bit-identical to `stableHash60(wordNGrams(...)(i))` but without
    * materializing gram strings through the interpreted HOF path.
    */
  def positionalGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(graft.functions.NativeHash
        .wordGramHashesColumn(col(textCol), n)).as(Seq("pos", "h")))

  /** Gram hashes appearing in ≥ `minDocs` DISTINCT documents, with the
    * smallest containing id as `keeper` (the copy the delete keeps).
    */
  private def repeatedHashes(grams: DataFrame, minDocs: Int): DataFrame =
    grams.groupBy("h")
      .agg(count_distinct(col("id")).as("__nd"), min("id").as("keeper"))
      .filter(col("__nd") >= minDocs)
      .select("h", "keeper")

  /** Per-document repeated-span exposure: how much of each document is
    * covered by cross-document verbatim n-grams. Output one row per
    * input document: (idCol, `n_grams`, `n_rep`, `rep_frac`) where
    * `n_rep` counts gram positions whose hash occurs in ≥ `minDocs`
    * distinct documents and `rep_frac` = n_rep / n_grams.
    *
    * Shuffle profile: one hash agg over (h, id) for document
    * frequencies, one equi-join of the positional index against the
    * one-row-per-hash repeated set, one hash agg by id. The documents
    * table itself never shuffles.
    */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"span gram length must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val grams = positionalGrams(df, idCol, textCol, n)
    val rep = repeatedHashes(grams, minDocs)
    val hits = grams.join(rep.select("h"), Seq("h"))
      .groupBy("id").agg(count(lit(1)).as("n_rep"))
    df.select(col(idCol).as("id"),
        greatest(size(T.tokens(col(textCol))) - lit(n - 1), lit(1))
          .cast("long").as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_rep"), lit(0L)).as("n_rep"),
        (coalesce(col("n_rep"), lit(0L)).cast("double") /
          col("n_grams")).as("rep_frac"))
  }

  /** The delete: remove every token covered by a cross-document
    * repeated n-gram from all documents EXCEPT the keeper (smallest id
    * containing that gram — deterministic on any engine; the keeper
    * keeps every copy it holds). Never drops rows: a fully-covered
    * document survives as an empty string. Output:
    * (idCol, `clean_text`, `n_kept`, `n_removed`) — clean_text is the
    * surviving tokens joined by single spaces (tokenization already
    * collapses whitespace, like the reference normalize-then-rebuild
    * scrubbers).
    *
    * Scale note: covered positions explode each repeated gram
    * occurrence into n (id, tokpos) int pairs before the distinct —
    * bounded by n × repeated-occurrence count. The token-level
    * anti-join shuffles (id, pos, token) — the only text-bearing
    * shuffle, same scale as any tokenize-regroup pass.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"span gram length must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val grams = positionalGrams(df, idCol, textCol, n)
    val rep = repeatedHashes(grams, minDocs)
    val covered = grams.join(rep, Seq("h"))
      .filter(col("id") =!= col("keeper"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tp"))
      .distinct()
    val toks = df.select(col(idCol).as("id"),
      posexplode(T.tokens(col(textCol))).as(Seq("tp", "tok")))
    val kept = toks.join(covered, Seq("id", "tp"), "left_anti")
      .groupBy("id").agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id"),
        coalesce(size(T.tokens(col(textCol))).cast("long"), lit(0L))
          .as("__total"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }
}
