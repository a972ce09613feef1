package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the minhash / simhash signatures.
  *
  * The composed expression-tree forms (charShingles → md5 → conv →
  * k × array_min(transform(...))) are semantically right but run in
  * Catalyst's INTERPRETED higher-order-function path: per shingle they
  * allocate a substring array element, format an md5 hex string, parse
  * it back, and then walk the hash array once per permutation. These
  * Expressions do the whole signature in one tight JVM loop per row —
  * one MessageDigest reuse, no intermediate arrays, k mins updated in
  * place. `CodegenFallback` costs one virtual call per ROW (noise),
  * not per element like the HOF path.
  *
  * Semantics are BIT-IDENTICAL to the tree forms (verified by
  * NativeHashSpec against the original expressions), so the DuckDB
  * oracles are unchanged:
  *  - shingles = substring(text, i, len) for i in 1..max(chars-len+1,1)
  *    (code-point based, like SQL substring);
  *  - hash60 = first 15 md5 hex chars parsed base-16 = top 60 bits of
  *    the digest's big-endian first 8 bytes;
  *  - minhash entry j = min over shingles of (a_j·(h mod P)+b_j) mod P;
  *  - simhash bit j set iff Σ_tokens (±1 by hash bit j) > 0, tokens =
  *    split(trim(text), "\\s+") with Spark's keep-trailing-empties
  *    semantics.
  */
object NativeHash {
  val Prime: Long = HashFunctions.Prime

  /** Top 60 bits of md5 == conv(substring(md5hex, 1, 15), 16, 10). */
  def hash60(bytes: Array[Byte], md: MessageDigest): Long = {
    md.reset()
    val d = md.digest(bytes)
    ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** [[hash60]] over a byte RANGE — the allocation-free form the
    * sliding-window kernels use (no per-window substring copy).
    */
  def hash60(bytes: Array[Byte], off: Int, len: Int,
      md: MessageDigest): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  def minhashColumn(text: Column, k: Int, shingleLen: Int,
      seed: Long = 42L): Column =
    Bridge.column(
      ShingleMinHash(Bridge.expression(text), k, shingleLen,
        seed))

  /** Aggregate: exact element-wise sum of an array<long> column. */
  def vecSumColumn(vec: Column): Column =
    Bridge.column(
      VecSumLong(Bridge.expression(vec)).toAggregateExpression())

  def vecOuterSumColumn(vec: Column): Column =
    Bridge.column(
      VecOuterSumLong(Bridge.expression(vec)).toAggregateExpression())

  def simhashColumn(text: Column, bits: Int = 60): Column =
    Bridge.column(
      TokenSimHash(Bridge.expression(text), bits))

  def distinctWordNGramsColumn(text: Column, n: Int): Column =
    Bridge.column(DistinctWordNGrams(Bridge.expression(text), n))

  def quantizeColumn(vec: Column): Column =
    Bridge.column(QuantizeVec(Bridge.expression(vec)))

  def dotQColumn(a: Column, b: Column): Column =
    Bridge.column(DotQ(Bridge.expression(a), Bridge.expression(b)))

  def hyperplaneBitsColumn(qv: Column, dim: Int, planes: Int,
      planeOffset: Int): Column =
    Bridge.column(
      HyperplaneBits(Bridge.expression(qv), dim, planes, planeOffset))

  def stopwordRatioColumn(text: Column, words: Seq[String]): Column =
    Bridge.column(StopwordRatio(Bridge.expression(text), words))

  def langIdColumn(text: Column,
      markers: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangIdArgmax(Bridge.expression(text), markers))

  def dupLineStatsColumn(doc: Column): Column =
    Bridge.column(DupLineStats(Bridge.expression(doc)))

  def repeatedNGramCharFracColumn(text: Column, n: Int): Column =
    Bridge.column(RepeatedNGramCharFrac(Bridge.expression(text), n))

  def nfcColumn(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  def redactIbansColumn(text: Column): Column =
    Bridge.column(RedactIbans(Bridge.expression(text)))

  def pyTitleColumn(text: Column): Column =
    Bridge.column(PyTitle(Bridge.expression(text)))

  def wordGramHashesColumn(text: Column, n: Int): Column =
    Bridge.column(WordGramHashes(Bridge.expression(text), n))

  def compressionRatioColumn(text: Column): Column =
    Bridge.column(CompressionRatio(Bridge.expression(text)))

  def nearestCentroidColumn(qv: Column,
      cents: Seq[Seq[Long]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(qv), cents))

  def probeCentroidsColumn(qv: Column, cents: Seq[Seq[Long]],
      nProbe: Int): Column =
    Bridge.column(
      ProbeCentroids(Bridge.expression(qv), cents, nProbe))

  def groupedNearestCentroidColumn(qv: Column, group: Column,
      cents: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(GroupedNearestCentroid(Bridge.expression(qv),
      Bridge.expression(group), cents))

  def pqEncodeColumn(qv: Column, codebook: Seq[Seq[Seq[Long]]])
      : Column =
    Bridge.column(PqEncode(Bridge.expression(qv), codebook))

  def pqAdcDistColumn(qv: Column, codes: Column,
      codebook: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(PqAdcDistance(Bridge.expression(qv),
      Bridge.expression(codes), codebook))

  def hashingVectorizeColumn(text: Column, dim: Int): Column =
    Bridge.column(HashingVectorize(Bridge.expression(text), dim))
}

/** Milli-unit quantization of a float/double vector — the native form
  * of `transform(v, x -> round(x*1000).cast(long))`, using the same
  * BigDecimal HALF_UP rounding as Spark's `round`.
  */
final case class QuantizeVec(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quantize_vec"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType
    val n   = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case _ => throw new IllegalArgumentException(
          s"quantize expects array<float|double>, got $elemType")
      }
      // valueOf (decimal-string repr), not new BigDecimal (exact binary)
      // — Spark's Round works on the decimal representation
      out(i) = java.math.BigDecimal.valueOf(d * 1000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact int64 dot product of two quantized vectors — the native form
  * of `aggregate(zip_with(a, b, _*_), 0L, _+_)` (integer arithmetic,
  * order-independent, bit-identical). Full codegen (not a
  * CodegenFallback): this expression sits in the per-pair hot loop of
  * every vector operator — brute/LSH/IVF top-k, cosine near-dup,
  * semantic dedup, the kNN graph — where the interpreted eval's
  * virtual-call-per-row overhead was measurable at bucket scale.
  */
final case class DotQ(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i   = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane LSH sign bits of a quantized vector — the native form of
  * [[graft.operators.Similarity.hyperplaneBucketQ]]'s expression tree:
  * bit p of the result = (Σ_j qv(j)·w(planeOffset+p, j) ≥ 0), with the
  * same deterministic integer weights.
  */
final case class HyperplaneBits(
    child: Expression,
    dim: Int,
    planes: Int,
    planeOffset: Int
) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bits"

  @transient private lazy val weights: Array[Array[Long]] =
    Array.tabulate(planes, dim)((p, j) =>
      graft.operators.Similarity.planeComponent(planeOffset + p, j))

  override protected def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n  = math.min(qv.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < planes) {
      val w = weights(p)
      var dot = 0L
      var j = 0
      while (j < n) { dot += qv.getLong(j) * w(j); j += 1 }
      if (dot >= 0) bits |= 1L << p
      p += 1
    }
    bits
  }

  // full codegen (the per-row inner loop of LSH bucketing): the weight
  // table rides along as a reference object, the generated loop is the
  // interpreted one verbatim
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val w = ctx.addReferenceObj("hyperplaneWeights", weights,
      "long[][]")
    nullSafeCodeGen(ctx, ev, qv => {
      val n    = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val p    = ctx.freshName("p")
      val dot  = ctx.freshName("dot")
      val j    = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($qv.numElements(), $dim);
         |long $bits = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $dot = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $qv.getLong($j) * $w[$p][$j];
         |  }
         |  if ($dot >= 0) $bits |= 1L << $p;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Distinct word n-grams (array<string>) of a string column — the
  * native form of `array_distinct(TextFunctions.wordNGrams(c, n))`,
  * matching it element-for-element including first-occurrence dedup
  * order, slice truncation for docs shorter than n tokens, and Spark's
  * keep-trailing-empties split semantics.
  */
final case class DistinctWordNGrams(
    child: Expression,
    n: Int
) extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_word_ngrams"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val s      = input.asInstanceOf[UTF8String]
    val tokens = ws.split(s.trim().toString, -1)
    val cnt    = math.max(tokens.length - (n - 1), 1)
    val seen   = new java.util.LinkedHashSet[String]
    var i = 0
    while (i < cnt) {
      val end = math.min(i + n, tokens.length)
      val sb  = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      out(idx) = UTF8String.fromString(it.next()); idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** MinHash signature (array<long> of k entries) of a string column. */
final case class ShingleMinHash(
    child: Expression,
    k: Int,
    shingleLen: Int,
    seed: Long
) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_minhash"

  @transient private lazy val (as, bs) = {
    val seeds = HashFunctions.permutationSeeds(k, seed)
    (seeds.map(_._1).toArray, seeds.map(_._2).toArray)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s     = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val n     = s.numChars()
    val cnt   = math.max(n - (shingleLen - 1), 1)
    // char -> byte offset table (one linear pass) lets each shingle
    // hash a WINDOW of the doc's UTF-8 bytes in place — the previous
    // substringSQL + getBytes form allocated two objects per shingle
    // and dominated the signature pass (measured 2x the whole-pipeline
    // cost at sf0.1). Hash values are bit-identical: md5 over the same
    // bytes.
    val offs = new Array[Int](n + 1)
    var b = 0
    var c = 0
    while (c < n) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(n) = bytes.length
    val md   = MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < cnt) {
      val start = offs(math.min(i, n))
      val end   = offs(math.min(i + shingleLen, n))
      val hm = NativeHash.hash60(bytes, start, end - start, md) %
        NativeHash.Prime
      var j = 0
      while (j < k) {
        val p = (as(j) * hm + bs(j)) % NativeHash.Prime
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SimHash (long, low `bits` bits) of a string column. */
final case class TokenSimHash(
    child: Expression,
    bits: Int
) extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 60, "bits must be in (0, 60]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_simhash"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val s      = input.asInstanceOf[UTF8String]
    val tokens = ws.split(s.trim().toString, -1)
    val md     = MessageDigest.getInstance("MD5")
    val votes  = new Array[Int](bits)
    var t = 0
    while (t < tokens.length) {
      val h = NativeHash.hash60(tokens(t).getBytes("UTF-8"), md)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sh = 0L
    var j  = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Stopword hit ratio — the native form of
  * `size(filter(split(trim(c),"\\s+"), t -> t.isin(words))) /
  *  greatest(size(split(trim(c),"\\s+")), 1)`.
  * The tree form tokenizes TWICE (no CSE in the interpreted HOF path)
  * and runs an |words|-way isin per token; this is one tokenize pass
  * with a hash-set probe per token. Tokenization is bit-identical to
  * Spark's: space-only trim (UTF8String.trim), then `\s+` split
  * keeping trailing empties.
  */
final case class StopwordRatio(
    child: Expression,
    words: Seq[String]
) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_stopword_ratio"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val tokens =
      ws.split(input.asInstanceOf[UTF8String].trim().toString, -1)
    var hits = 0
    var i = 0
    while (i < tokens.length) {
      if (set.contains(tokens(i))) hits += 1
      i += 1
    }
    hits.toDouble / math.max(tokens.length, 1)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Language-ID argmax — the native form of the langId tree: per
  * language, hits = count of tokens in its marker set; result = first
  * language (marker order) whose hits equal the maximum, or "und" when
  * the maximum is 0. One tokenize pass, one hash-map probe per token —
  * the tree form re-tokenizes per language and isin-scans per token.
  */
final case class LangIdArgmax(
    child: Expression,
    markers: Seq[(String, Seq[String])]
) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")
  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val und: UTF8String =
    UTF8String.fromString("und")
  @transient private lazy val lookup
      : java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val tokens =
      ws.split(input.asInstanceOf[UTF8String].trim().toString, -1)
    val hits = new Array[Int](markers.length)
    var i = 0
    while (i < tokens.length) {
      val ls = lookup.get(tokens(i))
      if (ls != null) {
        var j = 0
        while (j < ls.length) { hits(ls(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var k = 0
    while (k < hits.length) {
      if (hits(k) > best) best = hits(k)
      k += 1
    }
    if (best <= 0) und
    else {
      var idx = 0
      while (hits(idx) != best) idx += 1
      langs(idx)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Line-repetition stats — the native one-pass form of the
  * `duplicateLineFraction` / `duplicateLineCharFraction` trees (which
  * run an O(lines²) interpreted-HOF count that additionally re-derives
  * the whole line ARRAY per element, O(lines³) in practice). One split,
  * one hash-map count, both fractions from the same pass:
  *  - dup_line_frac = (lines − distinct lines) / max(lines, 1)
  *  - dup_char_frac = Σ chars of every occurrence of a line whose
  *    count > 1, over max(chars(doc), 1)
  * Lines split on "\n" keeping trailing empties; char counts are code
  * points (= Spark `length`).
  */
final case class DupLineStats(
    child: Expression
) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_char_frac", DoubleType, nullable = false)))
  override def prettyName: String = "graft_dup_line_stats"

  @transient private lazy val nl: Pattern = Pattern.compile("\n")

  override protected def nullSafeEval(input: Any): Any = {
    val doc = input.asInstanceOf[UTF8String]
    val lines = nl.split(doc.toString, -1)
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < lines.length) {
      counts.merge(lines(i), 1, (a, b) => a + b)
      i += 1
    }
    var dupChars = 0L
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (counts.get(l) > 1)
        dupChars += l.codePointCount(0, l.length)
      i += 1
    }
    val nLines = lines.length
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    row.setDouble(0,
      (nLines - counts.size).toDouble / math.max(nLines, 1))
    row.setDouble(1,
      dupChars.toDouble / math.max(doc.numChars(), 1))
    row
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Repeated-n-gram char fraction — the native one-pass form of
  * `topBigramCharFraction`'s tree (whose lambda re-derives the entire
  * gram array per distinct gram: O(grams³) interpreted). Semantics are
  * the tree's exactly: tokens = split(trim(text), "\s+") keeping
  * trailing empties; grams = space-joined windows starting at
  * 0..max(tokens−n, 0) (so a doc shorter than n tokens yields one
  * truncated gram); result = max over grams with count ≥ 2 of
  * count·chars(gram), divided by max(chars(text), 1) — 0 when nothing
  * repeats.
  */
final case class RepeatedNGramCharFrac(
    child: Expression,
    n: Int
) extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_repeated_ngram_char_frac"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val tokens = ws.split(raw.trim().toString, -1)
    val last = math.max(tokens.length - n, 0)
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, tokens.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > 1) {
        val g = e.getKey
        val v = c.toLong * g.codePointCount(0, g.length)
        if (v > best) best = v
      }
    }
    best.toDouble / math.max(raw.numChars(), 1)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Unicode NFC normalization — canonical composition, so "café" typed
  * as `e` + U+0301 (combining acute) and as precomposed U+00E9 hash,
  * fingerprint and dedup identically. The kernel probes
  * `Normalizer.isNormalized` first: for the common already-NFC (e.g.
  * pure-ASCII) document it is a single scan with ZERO allocation, and
  * only genuinely decomposed text pays the compose pass. Matches
  * DuckDB's `nfc_normalize` (both implement Unicode canonical
  * composition), so SQL oracles replay it directly.
  */
final case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Python `str.title()` semantics: the first CASED character after any
  * uncased character (string start, digit, punctuation — not just
  * whitespace) titlecases; every other cased character lowercases. So
  * "o'neil" → "O'Neil" and "foo-bar" → "Foo-Bar" where `initcap` gives
  * "O'neil" / "Foo-bar". Cased = upper/lower/titlecase letter
  * (Python's definition); code-point loop, surrogate-safe.
  */
final case class PyTitle(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_py_title"

  private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isCased(cp)) {
        sb.appendCodePoint(
          if (prevCased) Character.toLowerCase(cp)
          else Character.toTitleCase(cp))
        prevCased = true
      } else {
        sb.appendCodePoint(cp)
        prevCased = false
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Positional word-n-gram hash60 array — the native form of
  * `transform(TextFunctions.wordNGrams(c, n), g => stableHash60(g))`:
  * entry i is the top-60-bit md5 of the gram starting at token i
  * (tokens i..i+n-1 joined by one space; slice-truncated for docs
  * shorter than n tokens, matching wordNGrams). One tokenize pass, one
  * reused MessageDigest and StringBuilder — no gram-string array ever
  * materializes, where the tree form allocates every gram through the
  * interpreted HOF path and md5s it as a separate expression step.
  * Bit-identical to the tree form (NativeHashSpec).
  */
final case class WordGramHashes(
    child: Expression,
    n: Int
) extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_gram_hashes"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val s      = input.asInstanceOf[UTF8String]
    val tokens = ws.split(s.trim().toString, -1)
    val cnt    = math.max(tokens.length - (n - 1), 1)
    val md     = MessageDigest.getInstance("MD5")
    val sb     = new java.lang.StringBuilder
    val out    = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      val end = math.min(i + n, tokens.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      out(i) = NativeHash.hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), md)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact element-wise sum of an `array<long>` column — the aggregate
  * under every k-means-style fit (per-cluster component sums over
  * quantized vectors). The composed form, `dim` separate
  * `sum(element_at(v, j))` aggregates, generates one enormous codegen
  * unit PER DISTINCT PLAN — and an iterative fit changes its centroid
  * literals every iteration, so every iteration pays a fresh ~1 s
  * janino compile (measured: a 64-sum aggregate over 2,000 rows cost
  * 1.24 s, >95% compilation). This TypedImperativeAggregate keeps one
  * long[] of state per group, forces the (tiny, ≤ nCentroids groups)
  * aggregate onto ObjectHashAggregate, and adds NOTHING to codegen.
  * Null vectors are skipped; a group with no non-null input yields
  * null; ragged lengths fail loudly — including a zero-length array
  * mixed with sized rows, and a group of all-EMPTY arrays sums to an
  * empty array (not null). The buffer carries a leading seen-flag
  * slot so "no input yet" (length 0) stays distinguishable from
  * "saw empty vectors" (length 1).
  */
final case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): Array[Long] =
    Array.emptyLongArray

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n   = arr.numElements()
      // slot 0 is the seen flag; sums live in slots 1..n
      val b   = if (buf.length == 0) {
        val fresh = new Array[Long](n + 1); fresh(0) = 1L; fresh
      } else buf
      require(b.length == n + 1,
        s"graft_vec_sum: ragged vector lengths (${b.length - 1} vs $n)")
      var i = 0
      while (i < n) { b(i + 1) += arr.getLong(i); i += 1 }
      b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      require(a.length == b.length,
        s"graft_vec_sum: ragged vector lengths (${a.length - 1} vs ${b.length - 1})")
      var i = 1
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null
    else new GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 1, buf.length))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : VecSumLong = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : VecSumLong = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : VecSumLong = copy(child = newChild)
}

/** One-pass upper-triangle gram matrix Σ v·vᵀ over quantized int64
  * vectors: the distributed half of PCA (and any covariance-driven
  * fit). For dim d the buffer is d(d+1)/2 sums — 2 080 longs at
  * d = 64 — merged associatively, so 100 TB of vectors reduce to ONE
  * tiny driver object in a single map-side-combined aggregation; the
  * eigen solve on that d×d matrix is then driver-trivial. All-integer
  * accumulation keeps the result bit-identical across partitionings
  * and engines (the DuckDB oracle replays it as SUM(qv[i]*qv[j])).
  * Same contracts as [[VecSumLong]]: null vectors skipped, no input →
  * null, ragged lengths (including empty-vs-sized) fail loudly; slot 0
  * carries the dimension so "no input" (length 0 buffer) stays
  * distinguishable from "saw zero-length vectors" (slot 0 = 0).
  */
final case class VecOuterSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_outer_sum"

  override def createAggregationBuffer(): Array[Long] =
    Array.emptyLongArray

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n   = arr.numElements()
      // slot 0 is the dimension; sums live row-major i<=j in 1..
      val b = if (buf.length == 0) {
        val fresh = new Array[Long](1 + n * (n + 1) / 2)
        fresh(0) = n.toLong; fresh
      } else buf
      require(b(0) == n.toLong,
        s"graft_vec_outer_sum: ragged vector lengths (${b(0)} vs $n)")
      val vs = new Array[Long](n)
      var i = 0
      while (i < n) { vs(i) = arr.getLong(i); i += 1 }
      var k = 1
      i = 0
      while (i < n) {
        val vi = vs(i)
        var j = i
        while (j < n) { b(k) += vi * vs(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      require(a(0) == b(0),
        s"graft_vec_outer_sum: ragged vector lengths (${a(0)} vs ${b(0)})")
      var i = 1
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null
    else new GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 1, buf.length))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : VecOuterSumLong = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : VecOuterSumLong = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : VecOuterSumLong = copy(child = newChild)
}

/** Deflate compression ratio of the text's UTF-8 bytes (zlib level 6,
  * raw stream): compressed size / original size. The cheap
  * information-density quality signal — boilerplate and template spam
  * compress far below natural prose, catching repetition that n-gram
  * signals at a fixed n miss. Deterministic for a given JVM zlib;
  * NOT engine-portable (no SQL oracle), so it ships spec-verified
  * like the other engine-internal ops. Only byte-EMPTY documents
  * report 1.0 (no evidence of redundancy, not a divide by zero); any
  * non-empty input — including whitespace-only — is genuinely
  * deflated, and very short inputs report ratios above 1.0 from
  * stream overhead (an honest "incompressible" signal, not an error).
  */
final case class CompressionRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_compression_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 1.0
    else {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var compressed = 0L
        while (!d.finished()) compressed += d.deflate(buf)
        compressed.toDouble / bytes.length
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Static scoring loops shared by [[NearestCentroid]] and
  * [[ProbeCentroids]] — top-level object so the generated code calls
  * them through Scala's static forwarders (one method call per row,
  * inside whole-stage codegen).
  *
  * score(v, c_i) = dot(v, c_i) / sqrt(dot(c_i, c_i)): exact int64
  * dot, one correctly-rounded sqrt (precomputed per centroid) and one
  * correctly-rounded divide — bit-identical to the replaced
  * per-centroid literal expression tree, so every DuckDB oracle that
  * replays the fit is unchanged. Zero-norm centroids score
  * Double.MinValue (never win against any real score); ties go to the
  * lowest centroid index.
  */
object CentroidKernel {

  private def score(v: org.apache.spark.sql.catalyst.util.ArrayData,
      vn: Int, c: Array[Long], norm: Double): Double =
    if (norm == 0d) Double.MinValue
    else {
      val m = math.min(vn, c.length)
      var dot = 0L
      var j = 0
      while (j < m) { dot += v.getLong(j) * c(j); j += 1 }
      dot.toDouble / norm
    }

  /** Index of the best-scoring centroid (argmax, ties → lowest). */
  def argmax(v: org.apache.spark.sql.catalyst.util.ArrayData,
      cents: Array[Array[Long]], norms: Array[Double]): Int = {
    val vn = v.numElements()
    var best = 0
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val s = score(v, vn, cents(i), norms(i))
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best
  }

  /** Indices of the `nProbe` best centroids, best first (score desc,
    * index asc among equal scores) — a k-slot insertion pass, O(n·k)
    * worst case but O(n) when most candidates miss the current top-k.
    */
  def topK(v: org.apache.spark.sql.catalyst.util.ArrayData,
      cents: Array[Array[Long]], norms: Array[Double], nProbe: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = math.min(nProbe, cents.length)
    val idx = new Array[Int](k)
    val sc  = new Array[Double](k)
    var filled = 0
    val vn = v.numElements()
    var i = 0
    while (i < cents.length) {
      val s = score(v, vn, cents(i), norms(i))
      if (filled < k) {
        var p = filled
        while (p > 0 && s > sc(p - 1)) {
          sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
        }
        sc(p) = s; idx(p) = i
        filled += 1
      } else if (s > sc(k - 1)) { // strict >: equal keeps lower index
        var p = k - 1
        while (p > 0 && s > sc(p - 1)) {
          sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
        }
        sc(p) = s; idx(p) = i
      }
      i += 1
    }
    new GenericArrayData(idx)
  }
}

/** [[CentroidKernel.argmax]] against a PER-GROUP centroid matrix —
  * the assignment step of the two-level (hierarchical) IVF fit, where
  * each top-level cluster owns its own sub-centroid matrix. Returns
  * the best sub-index WITHIN group `g`; a group with no centroids
  * (a top cluster that owns no rows) returns 0 — no row can carry
  * that group index at assignment time.
  */
object GroupedCentroidKernel {
  def argmax(v: org.apache.spark.sql.catalyst.util.ArrayData, g: Int,
      matrices: Array[Array[Array[Long]]],
      norms: Array[Array[Double]]): Int =
    if (g < 0 || g >= matrices.length || matrices(g).length == 0) 0
    else CentroidKernel.argmax(v, matrices(g), norms(g))
}

/** Sub-centroid argmax within the group selected by the second child —
  * the per-row assignment of the two-level fit ([[Similarity
  * .fitCentroidsTwoLevel]]): O(k₂·dim) per row instead of the flat
  * O(k₁·k₂·dim). The full nested matrix rides along as one reference
  * object, so plan size stays constant in the total centroid count.
  */
final case class GroupedNearestCentroid(vec: Expression,
    group: Expression, centroids: Seq[Seq[Seq[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = group
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_grouped_nearest_centroid"

  @transient private lazy val mats: Array[Array[Array[Long]]] =
    centroids.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val norms: Array[Array[Double]] =
    centroids.map(_.map(c =>
      math.sqrt(c.map(x => x * x).sum.toDouble)).toArray).toArray

  override protected def nullSafeEval(v: Any, g: Any): Any =
    GroupedCentroidKernel.argmax(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      g.asInstanceOf[Int], mats, norms)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val m  = ctx.addReferenceObj("groupedCentroids", mats, "long[][][]")
    val nm = ctx.addReferenceObj("groupedNorms", norms, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, g) =>
      s"${ev.value} = graft.functions.GroupedCentroidKernel" +
        s".argmax($v, $g, $m, $nm);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, group = newRight)
}

/** Index of the spherically-nearest centroid of a quantized vector —
  * the native form of the per-centroid `greatest(struct(score, -i))`
  * literal tree, whose expression size is O(nCentroids × dim)
  * literals: analysis plus janino stopped compiling in the
  * hundreds-to-low-thousands of centroids, far below the documented
  * 65536 auto-k ceiling of the IVF/kNN-graph/SemDeDup fits. Here the
  * centroid matrix rides along as ONE reference object and the argmax
  * is a tight loop, so expression size is constant in nCentroids.
  */
final case class NearestCentroid(child: Expression,
    centroids: Seq[Seq[Long]]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
      .toArray

  override protected def nullSafeEval(input: Any): Any =
    CentroidKernel.argmax(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cents, norms)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c  = ctx.addReferenceObj("centroidMatrix", cents, "long[][]")
    val nm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidKernel.argmax($v, $c, $nm);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Indices of the `nProbe` spherically-nearest centroids, best first —
  * the native form of the `transform(slice(reverse(array_sort(...))))`
  * literal tree; same constant-size-in-nCentroids story as
  * [[NearestCentroid]].
  */
final case class ProbeCentroids(child: Expression,
    centroids: Seq[Seq[Long]], nProbe: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_probe_centroids"

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
      .toArray

  override protected def nullSafeEval(input: Any): Any =
    CentroidKernel.topK(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cents, norms, nProbe)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c  = ctx.addReferenceObj("centroidMatrix", cents, "long[][]")
    val nm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidKernel.topK($v, $c, $nm, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Static loops shared by [[PqEncode]] and [[PqAdcDistance]] — the
  * product-quantization half of the ANN surface. All distances are
  * exact int64 squared-L2 over the milli-unit quantized vectors, so
  * codes and ADC rankings are bit-identical on any partitioning and
  * replayable by an independent SQL engine. `codebook(s)(j)` is the
  * j-th centroid of subspace `s`; subvector `s` of a d-long vector is
  * elements [s·dsub, (s+1)·dsub).
  */
object PqKernel {

  private def subDist2(v: org.apache.spark.sql.catalyst.util.ArrayData,
      off: Int, c: Array[Long]): Long = {
    var d2 = 0L
    var i = 0
    while (i < c.length) {
      val diff = v.getLong(off + i) - c(i)
      d2 += diff * diff
      i += 1
    }
    d2
  }

  /** Per-subspace argmin of exact squared L2 (ties → lowest code).
    * A vector whose length is not EXACTLY the codebook's m·dsub fails
    * loudly — a silently padded code would poison every downstream
    * distance, and silently IGNORED trailing dimensions would make
    * two different vectors encode identically with no error.
    */
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData,
      codebook: Array[Array[Array[Long]]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = codebook.length
    val span = {
      var t = 0; var i = 0
      while (i < m) { t += codebook(i)(0).length; i += 1 }
      t
    }
    require(v.numElements() == span,
      s"graft_pq_encode: vector length ${v.numElements()} != " +
        s"codebook span $span")
    val codes = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      val dsub  = cents(0).length
      var best  = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < cents.length) {
        val d2 = subDist2(v, off, cents(j))
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric distance: exact Σ_s ‖q_s − c_{s,code_s}‖² between a
    * full query vector and a corpus row's codes. Query length must
    * match the codebook span exactly (same no-silent-truncation
    * contract as [[encode]]).
    */
  def adcDist2(q: org.apache.spark.sql.catalyst.util.ArrayData,
      codes: org.apache.spark.sql.catalyst.util.ArrayData,
      codebook: Array[Array[Array[Long]]]): Long = {
    require(codes.numElements() == codebook.length,
      s"graft_pq_adc: ${codes.numElements()} codes for " +
        s"${codebook.length} subspaces")
    val span = {
      var t = 0; var i = 0
      while (i < codebook.length) { t += codebook(i)(0).length; i += 1 }
      t
    }
    require(q.numElements() == span,
      s"graft_pq_adc: query length ${q.numElements()} != " +
        s"codebook span $span")
    var d2 = 0L
    var off = 0
    var s = 0
    while (s < codebook.length) {
      val cents = codebook(s)
      val code  = codes.getInt(s)
      require(code >= 0 && code < cents.length,
        s"graft_pq_adc: code $code out of range [0, ${cents.length})")
      d2 += subDist2(q, off, cents(code))
      off += cents(0).length
      s += 1
    }
    d2
  }
}

/** Product-quantization codes of a quantized vector: `m` bytes-worth
  * of per-subspace nearest-centroid indices replace m·dsub·8 bytes of
  * raw vector — the compressed-domain corpus representation that
  * makes 100 TB ANN memory-resident. The codebook rides along as ONE
  * reference object (constant plan size in m·ksub·dsub, same story as
  * [[NearestCentroid]]); the argmin loop runs inside whole-stage
  * codegen.
  */
final case class PqEncode(child: Expression,
    codebook: Seq[Seq[Seq[Long]]]) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cb)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact asymmetric (query-to-code) squared distance — the scoring
  * half of PQ search: the corpus side stays compressed (codes only),
  * the query side stays full-precision. Int64 throughout, so the
  * ranking an oracle computes from the same codes is identical.
  */
final case class PqAdcDistance(left: Expression, right: Expression,
    codebook: Seq[Seq[Seq[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc_dist2"

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernel.adcDist2(
      q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cb)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    nullSafeCodeGen(ctx, ev, (q, codes) =>
      s"${ev.value} = graft.functions.PqKernel.adcDist2($q, $codes, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Feature-hashing ("hashing trick") count vector of a document's
  * whitespace tokens: token t contributes `sign(t)` at coordinate
  * `bucket(t)`, with `bucket = hash60 mod dim` and `sign = +1/−1 by
  * the next hash bit` (`(hash60 / dim) mod 2` — independent of the
  * bucket bits for any dim, the unbiased-inner-product construction
  * of Weinberger et al. 2009). Token hashing is the same
  * md5/hash60 + trim + `\s+` split discipline as [[TokenSimHash]],
  * so a SQL engine replays the vector exactly from the documents —
  * this is how a corpus gets embedding-shaped WITHOUT a model, in
  * one map-only pass, feeding PCA / ANN / PQ directly. All-integer
  * output: partitioning- and engine-invariant.
  */
final case class HashingVectorize(
    child: Expression,
    dim: Int
) extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashing_vectorize"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val s      = input.asInstanceOf[UTF8String]
    val tokens = ws.split(s.trim().toString, -1)
    val md     = MessageDigest.getInstance("MD5")
    val out    = new Array[Long](dim)
    var t = 0
    while (t < tokens.length) {
      val h = NativeHash.hash60(tokens(t).getBytes("UTF-8"), md)
      val bucket = (h % dim).toInt // h >= 0: top-60-bit hash
      val sign   = if (((h / dim) & 1L) == 1L) -1L else 1L
      out(bucket) += sign
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Native form of [[TextFunctions.redactIbansTree]]: candidate
  * extraction with a precompiled java.util.regex pattern (the same
  * engine Spark's regexp_extract_all uses, so matches are identical),
  * the ISO 13616 mod-97 fold as a tight integer loop, and the
  * longest-checksum-valid space-boundary-prefix search — one JVM pass
  * per row instead of the interpreted nested-HOF ladder.
  * [[graft.TextFunctionsSpec]] pins native == tree on the adversarial
  * cases (greedy-swallowed candidates, near-misses, multi-IBAN docs).
  */
final case class RedactIbans(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_redact_ibans"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RedactIbans.redact(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RedactIbans {
  private lazy val CandPattern =
    Pattern.compile(TextFunctions.IbanCandidatePattern)

  /** Mod-97 residue of the REARRANGED compact IBAN (first four chars
    * cycled to the end): digits fold ·10, letters ·100 with A=10…Z=35
    * — same per-step reduction as the expression tree, accumulator
    * bounded under 9 634.
    */
  private def mod97(compact: String): Int = {
    val n = compact.length
    var acc = 0L
    var k = 0
    while (k < n) {
      val i = k + 4
      val ch = compact.charAt(if (i >= n) i - n else i)
      if (ch >= '0' && ch <= '9') acc = (acc * 10 + (ch - '0')) % 97
      else acc = (acc * 100 + (ch - 55)) % 97
      k += 1
    }
    acc.toInt
  }

  /** Longest space-boundary prefix of `cand` that is length-valid
    * (15–34 compact) and checksum-valid, or null. Matches the tree's
    * `element_at(valid, -1)` longest-wins semantics.
    */
  private def bestPrefix(cand: String): String = {
    val toks = cand.split(" ")
    var k = toks.length
    while (k >= 1) {
      val pref = toks.take(k).mkString(" ")
      val compact = pref.replace(" ", "")
      if (compact.length >= 15 && compact.length <= 34 &&
        mod97(compact) == 1) return pref
      k -= 1
    }
    null
  }

  def redact(s: String): String = {
    val m = CandPattern.matcher(s)
    // first-occurrence order, like array_distinct over the extracts
    val bests = scala.collection.mutable.LinkedHashSet.empty[String]
    val seen  = scala.collection.mutable.HashSet.empty[String]
    while (m.find()) {
      val c = m.group()
      if (seen.add(c)) {
        val b = bestPrefix(c)
        if (b != null) bests += b
      }
    }
    var out = s
    val it = bests.iterator
    while (it.hasNext) out = out.replace(it.next(), "<IBAN>")
    out
  }
}
