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
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 5, bands: Int = 4,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, shingleLen, seed).as("sig"))
    val exploded = withSig
      .select(col("id"), col("sig"),
        explode(bandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val a = exploded.select(col("band"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = exploded.select(col("band"), col("id").as("id_b"),
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
    * `bits` ≤ 60 keeps the value positive in an int64. Pure expression.
    */
  def simhash(textCol: Column, bits: Int = 32): Column = {
    val hashes = transform(T.tokens(textCol), t => H.stableHash60(t))
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (bit-sparse popcount
    * via the binary string — built-in expressions only).
    */
  def hammingDistance(a: Column, b: Column): Column =
    length(regexp_replace(bin(a.bitwiseXOR(b)), "0", ""))

  /** SimHash near-dup pairs: block on the four 8-bit chunks of the
    * 32-bit simhash (two near-dup docs differing in ≤ maxDist < 8 bits
    * must agree on at least one chunk — the standard pigeonhole
    * blocking), verify by Hamming distance.
    */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sh"))
    val chunks = array((0 until 4).map(i =>
      concat_ws(":", lit(i),
        (shiftright(col("sh"), i * 8) % 256).cast("string"))): _*)
    val exploded = withSh.select(col("id"), col("sh"),
      explode(chunks).as("chunk"))
    val a = exploded.select(col("chunk"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val b = exploded.select(col("chunk"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------ n-gram jaccard

  /** Word-n-gram Jaccard near-dup pairs via the inverted-index join:
    * explode distinct n-grams, self-join on the gram, count shared grams
    * per pair, jaccard = shared / (|A| + |B| − shared). Never builds the
    * full cross product — only pairs sharing ≥1 gram materialize.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      array_distinct(T.wordNGrams(col(textCol), n)).as("grams"))
    val sizes = grams.select(col("id"), size(col("grams")).as("n_grams"))
    val inv = grams.select(col("id"), explode(col("grams")).as("gram"))
    val shared = inv.as("x").join(inv.as("y"), Seq("gram"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_grams", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_grams", "n_b"), "id_b")
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
