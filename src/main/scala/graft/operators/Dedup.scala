package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Deduplication operators for corpus curation at scale: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup. (Embedding-cosine
  * near-dup lives in [[Similarity]].)
  *
  * Scale design notes:
  *  - Signatures (minhash, simhash, fingerprints) are PER-ROW expression
  *    trees — array higher-order functions over shingle arrays, no
  *    explode, no shuffle, no UDF. At 100 TB this is a single scan.
  *  - Candidate generation shuffles only (key, id) pairs — never
  *    documents — and all-pairs work happens strictly within LSH
  *    buckets / shared-gram groups (the standard inverted-index join),
  *    so the quadratic blow-up is bounded by bucket size, not corpus
  *    size.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest id per identical key. One hash
    * aggregation; at scale this is the cheapest possible formulation
    * (map-side partial min, shuffle carries only (key-hash, id)).
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String)
      : DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Near-exact dedup on the normalized-text fingerprint. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    df.withColumn("fingerprint", T.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  // -------------------------------------------------------------- minhash

  /** MinHash signature as an array column: for each of the k
    * permutations, the min permuted 60-bit hash over the document's
    * character shingles. Pure expression — no shuffle.
    */
  def minhashSignature(textCol: Column, k: Int, shingleLen: Int,
      seed: Long = 42L): Column = {
    val shingles = T.charShingles(textCol, shingleLen)
    val hashes   = transform(shingles, s => H.stableHash60(s))
    array(H.permutationSeeds(k, seed).map { case (a, b) =>
      array_min(transform(hashes, h => H.permuted(h, a, b)))
    }: _*)
  }

  /** LSH banding: md5 key per band of `rowsPerBand` signature entries.
    * Docs sharing any band key are near-dup candidates.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Candidate near-dup pairs via MinHash+LSH, verified with the exact
    * signature-level Jaccard estimate (fraction of agreeing minhash
    * entries ≥ threshold). Returns (idA, idB, est_jaccard) with
    * idA < idB.
    *
    * Shuffle profile: explode of (band-key, id, sig) → group by band
    * key → within-bucket pairs. Documents themselves never shuffle.
    *
    * Scale bound: buckets larger than `maxBucket` are DROPPED from
    * candidate generation (a degenerate band key — empty/boilerplate
    * documents — would otherwise go quadratic: a band shared by 1% of
    * a corpus creates (N/100)² candidate pairs). Within-bucket work is
    * therefore ≤ maxBucket² per bucket, linear in bucket count. The cap
    * is far above any honest near-dup cluster; raise it only with a
    * matching increase in executor memory.
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 5, bands: Int = 4,
      threshold: Double = 0.5, seed: Long = 42L,
      maxBucket: Long = 10000L): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, shingleLen, seed).as("sig"))
    val exploded = withSig
      .select(col("id"), col("sig"),
        explode(bandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val keptKeys = exploded.groupBy("band")
      .agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") <= maxBucket).select("band")
    val kept = exploded.join(keptKeys, Seq("band"))
    val a = kept.select(col("band"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = kept.select(col("band"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    val est = size(filter(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => (x === y).cast("int")), v => v === 1)).cast("double") /
      lit(k)
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), est.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** SimHash over whitespace tokens: bit j of the result is set iff the
    * sum over tokens of ±1 (by bit j of the token's hash) is positive.
    * Default 60 bits — the full usable width of a non-negative int64 —
    * so chunk blocking gets 4×15-bit chunks (32,768 buckets each)
    * instead of the 256 an 8-bit chunking would give: expected bucket
    * size N/32768, which keeps within-bucket all-pairs sub-quadratic at
    * corpus scale. Pure expression, no shuffle.
    */
  def simhash(textCol: Column, bits: Int = 60): Column = {
    val hashes = transform(T.tokens(textCol), t => H.stableHash60(t))
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (codegen'd popcount). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup pairs: block on the four 15-bit chunks of the
    * 60-bit simhash (two docs differing in ≤ maxDist < 4 chunks' worth
    * of bits must agree on at least one chunk — pigeonhole blocking),
    * verify by Hamming distance.
    *
    * Scale bound: 4×2^15 = 131k buckets; buckets above `maxBucket` are
    * dropped from candidate generation (see [[minhashDupPairs]]), so no
    * stage is quadratic in corpus size.
    */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Long = 10000L): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sh"))
    val chunks = array((0 until 4).map(i =>
      concat_ws(":", lit(i),
        (shiftright(col("sh"), i * 15).bitwiseAND(lit(32767L)))
          .cast("string"))): _*)
    val exploded = withSh.select(col("id"), col("sh"),
      explode(chunks).as("chunk"))
    val keptKeys = exploded.groupBy("chunk")
      .agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") <= maxBucket).select("chunk")
    val kept = exploded.join(keptKeys, Seq("chunk"))
    val a = kept.select(col("chunk"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val b = kept.select(col("chunk"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------ n-gram jaccard

  /** Word-n-gram Jaccard near-dup pairs, candidate-generate-then-verify:
    *
    *  1. inverted index over distinct n-grams, PRUNED of grams with
    *     document frequency > `dfCap` — an ungated index is the classic
    *     quadratic blow-up (a boilerplate/stopword gram shared by 1% of
    *     a 100 TB corpus creates a near-cartesian group). Per-gram work
    *     is thus ≤ dfCap² and linear in gram count;
    *  2. candidate pairs = ids sharing ≥ 1 surviving gram (ids only —
    *     documents never shuffle in this stage);
    *  3. EXACT verification: candidates join back to the (bounded)
    *     per-doc gram arrays and jaccard = |A∩B| / |A∪B| is computed on
    *     the full sets, so the cap can only lose candidates whose every
    *     shared gram is corpus-common — never report a wrong score.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, dfCap: Long = 1000L)
      : DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      array_distinct(T.wordNGrams(col(textCol), n)).as("grams"))
    val inv = grams.select(col("id"), explode(col("grams")).as("gram"))
    val keptGrams = inv.groupBy("gram")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap).select("gram")
    val kept = inv.join(keptGrams, Seq("gram"))
    val cand = kept.as("x").join(kept.as("y"), Seq("gram"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("__ga"), col("__gb")))
    cand
      .join(grams.select(col("id").as("id_a"), col("grams").as("__ga")),
        Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("grams").as("__gb")),
        Seq("id_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("__ga")) + size(col("__gb")) - inter))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
