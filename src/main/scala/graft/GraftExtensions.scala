package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, RegExpExtract, RegExpExtractAll, RegExpReplace, StringReplace, StringTrim}

import graft.functions.{DistinctWordNGrams, DotQ, DupLineStats, HyperplaneBits, LangIdArgmax, NfcNormalize, PyTitle, QuantizeVec, RepeatedNGramCharFrac, ShingleMinHash, StopwordRatio, TokenSimHash, TextFunctions}

/** SQL surface for the native expressions: registers
  * `graft_minhash(text, k, shingleLen, seed)`,
  * `graft_simhash(text[, bits])`, `graft_ngrams(text, n)`,
  * `graft_quantize(vec)`, `graft_dot_q(a, b)` and
  * `graft_hyperplane_bits(qv, dim, planes, offset)` so the operators'
  * kernels are reachable from `spark.sql(...)` as well as the Column
  * API.
  *
  * Two installation paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) at session build;
  *  - [[GraftFunctions.register]] on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // off until spark.graft.rangeJoin.chunkWidth is set — see the rule
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_minhash",
        info("graft_minhash",
          "graft_minhash(text, k, shingleLen, seed) - minhash signature"),
        (args: Seq[Expression]) => ShingleMinHash(args(0),
          intArg(args(1), "k"), intArg(args(2), "shingleLen"),
          longArg(args(3), "seed"))),
      ("graft_simhash",
        info("graft_simhash",
          "graft_simhash(text[, bits]) - simhash of whitespace tokens"),
        (args: Seq[Expression]) => TokenSimHash(args(0),
          if (args.size > 1) intArg(args(1), "bits") else 60)),
      ("graft_ngrams",
        info("graft_ngrams",
          "graft_ngrams(text, n) - distinct word n-grams"),
        (args: Seq[Expression]) =>
          DistinctWordNGrams(args(0), intArg(args(1), "n"))),
      ("graft_quantize",
        info("graft_quantize",
          "graft_quantize(vec) - milli-unit int64 quantization"),
        (args: Seq[Expression]) => QuantizeVec(args(0))),
      ("graft_dot_q",
        info("graft_dot_q",
          "graft_dot_q(a, b) - exact int64 dot product"),
        (args: Seq[Expression]) => DotQ(args(0), args(1))),
      ("graft_hyperplane_bits",
        info("graft_hyperplane_bits",
          "graft_hyperplane_bits(qv, dim, planes, offset) - LSH sign bits"),
        (args: Seq[Expression]) => HyperplaneBits(args(0),
          intArg(args(1), "dim"), intArg(args(2), "planes"),
          intArg(args(3), "offset"))),
      ("graft_stopword_ratio",
        info("graft_stopword_ratio",
          "graft_stopword_ratio(text) - stopword hit ratio over the " +
          "library's English stopword table (tokens of the input as-is)"),
        (args: Seq[Expression]) =>
          StopwordRatio(args(0), TextFunctions.Stopwords)),
      ("graft_lang_id",
        info("graft_lang_id",
          "graft_lang_id(text) - marker-table language ID ('und' on " +
          "zero hits); tokens of the input as-is"),
        (args: Seq[Expression]) =>
          LangIdArgmax(args(0), TextFunctions.LangMarkers)),
      ("graft_dup_line_stats",
        info("graft_dup_line_stats",
          "graft_dup_line_stats(doc) - struct(dup_line_frac, " +
          "dup_char_frac) line-repetition signals"),
        (args: Seq[Expression]) => DupLineStats(args(0))),
      ("graft_repeated_ngram_frac",
        info("graft_repeated_ngram_frac",
          "graft_repeated_ngram_frac(text, n) - char fraction of the " +
          "most repeated word n-gram"),
        (args: Seq[Expression]) =>
          RepeatedNGramCharFrac(args(0), intArg(args(1), "n"))),
      ("graft_nfc",
        info("graft_nfc",
          "graft_nfc(text) - Unicode NFC canonical composition"),
        (args: Seq[Expression]) => NfcNormalize(args(0))),
      ("graft_redact_ibans",
        info("graft_redact_ibans",
          "graft_redact_ibans(text) - mask mod-97-valid IBANs as " +
          "<IBAN> (checksum-gated, prefix-searched)"),
        (args: Seq[Expression]) =>
          graft.functions.RedactIbans(args(0))),
      ("graft_py_title",
        info("graft_py_title",
          "graft_py_title(text) - Python str.title() semantics " +
          "(titles at any non-letter boundary)"),
        (args: Seq[Expression]) => PyTitle(args(0))),
      ("graft_word_gram_hashes",
        info("graft_word_gram_hashes",
          "graft_word_gram_hashes(text, n) - positional word-n-gram " +
          "hash60 array"),
        (args: Seq[Expression]) =>
          graft.functions.WordGramHashes(args(0), intArg(args(1), "n"))),
      ("graft_compression_ratio",
        info("graft_compression_ratio",
          "graft_compression_ratio(text) - deflate compressed/original " +
          "byte ratio"),
        (args: Seq[Expression]) =>
          graft.functions.CompressionRatio(args(0))),
      ("graft_hash_vector",
        info("graft_hash_vector",
          "graft_hash_vector(text, dim) - feature-hashing count " +
          "vector (hash60 bucket + sign bit, exact int64)"),
        (args: Seq[Expression]) =>
          graft.functions.HashingVectorize(args(0),
            intArg(args(1), "dim"))),
      ("graft_script_count",
        info("graft_script_count",
          "graft_script_count(text, script) - characters inside the " +
          "named Unicode script's ranges"),
        (args: Seq[Expression]) => scriptCountExpr(args(0), args(1))),
      // composed-expression kernels: built as RESOLVED catalyst trees
      // from the SAME pattern constants the Column API uses (a Column
      // cannot convert to an expression inside an injected function —
      // it stays an unresolvable ColumnNodeExpression); the spec pins
      // SQL-vs-Column equality so the two chains cannot drift
      ("graft_html_text",
        info("graft_html_text",
          "graft_html_text(html) - crawl-page HTML to clean text " +
          "(script/style/comment removal, tag strip, entity decode, " +
          "whitespace canonicalization)"),
        (args: Seq[Expression]) => htmlTextExpr(args(0))),
      ("graft_html_title",
        info("graft_html_title",
          "graft_html_title(html) - page title ('' when absent)"),
        (args: Seq[Expression]) => normalizeExpr(
          RegExpExtract(args(0), Literal(TextFunctions.HtmlTitlePattern),
            Literal(1)))),
      ("graft_html_links",
        info("graft_html_links",
          "graft_html_links(html) - href targets (both quote styles) " +
            "in order"),
        (args: Seq[Expression]) => {
          // same quote-strip as TextFunctions.htmlLinks: the lambda
          // variable resolves in the analyzer's ResolveLambdaVariables
          // pass like any SQL-authored transform(...)
          import org.apache.spark.sql.catalyst.expressions.{
            ArrayTransform, LambdaFunction, Length, Subtract, Substring,
            UnresolvedNamedLambdaVariable}
          val s = UnresolvedNamedLambdaVariable(Seq("s"))
          ArrayTransform(
            RegExpExtractAll(args(0),
              Literal(TextFunctions.HtmlHrefPattern), Literal(1)),
            LambdaFunction(
              Substring(s, Literal(2), Subtract(Length(s), Literal(2))),
              Seq(s)))
        })
    )

  private def rre(e: Expression, p: String, r: String): Expression =
    RegExpReplace(e, Literal(p), Literal(r))

  /** Catalyst form of [[TextFunctions.scriptCount]] — the script name
    * must be a literal so the range resolves at function-build time.
    */
  private def scriptCountExpr(text: Expression, script: Expression)
      : Expression = {
    val name = script match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"script must be a string literal, got $other")
    }
    val range = TextFunctions.ScriptRanges.toMap.getOrElse(name,
      throw new IllegalArgumentException(s"unknown script '$name'"))
    org.apache.spark.sql.catalyst.expressions.Length(
      rre(text, s"[^$range]", ""))
  }

  /** Catalyst form of [[TextFunctions.normalizeText]]. */
  private def normalizeExpr(e: Expression): Expression =
    StringTrim(rre(rre(e, TextFunctions.ControlCharPattern, " "),
      TextFunctions.WsRunPattern, " "))

  /** Catalyst form of [[TextFunctions.htmlToText]]. */
  private def htmlTextExpr(h: Expression): Expression = {
    val noBlocks = TextFunctions.HtmlBlockPatterns
      .foldLeft(h)((e, p) => rre(e, p, " "))
    val noTags = rre(noBlocks, TextFunctions.HtmlTagPattern, " ")
    val decoded = TextFunctions.HtmlEntities.foldLeft(noTags) {
      case (e, (ent, ch)) => StringReplace(e, Literal(ent), Literal(ch))
    }
    normalizeExpr(decoded)
  }

  /** Register every graft function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, name, i, builder)
    }
}
