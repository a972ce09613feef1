package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for large-scale corpus curation: language
  * ID, quality scoring, token counting, fingerprinting. All pure
  * Catalyst expression trees — per-document work with no shuffle, so
  * they scan-scale linearly to arbitrary corpus size.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Feature-hashing count vector (dim int64 coordinates) of the
    * whitespace tokens — embedding-shaped text WITHOUT a model, in
    * one map-only kernel pass ([[graft.functions.HashingVectorize]]):
    * bucket = hash60(token) mod dim, sign = ±1 by the next hash bit.
    * Exact integers, engine-replayable; feeds PCA / ANN / PQ
    * directly.
    */
  def hashingVector(c: Column, dim: Int): Column =
    graft.functions.NativeHash.hashingVectorizeColumn(c, dim)

  /** BPE-ish sub-word segmentation: split on transitions between letter
    * runs, digit runs, and punctuation (a cheap proxy for a learned BPE
    * vocabulary — gives a stable, deterministic "token" budget).
    */
  def bpeishTokenCount(c: Column): Column =
    size(filter(
      split(c, "(?<=[a-zA-Z])(?=[^a-zA-Z])|(?<=[0-9])(?=[^0-9])|\\s+"),
      t => length(t) > 0))

  /** Character n-gram (shingle) array, positions 1..len−n+1. */
  def charShingles(c: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - lit(n - 1), lit(1))),
      i => c.substr(i, lit(n)))

  /** Word n-gram array from the whitespace tokens. slice+concat_ws
    * measured 2.5× faster than an element_at-per-token formulation in
    * the interpreted higher-order-function path — one arraycopy beats
    * n bounds-checked lookups.
    */
  def wordNGrams(c: Column, n: Int): Column = {
    val ts = tokens(c)
    transform(
      sequence(lit(1), greatest(size(ts) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(ts, i, lit(n))))
  }

  /** Quality-scoring feature set (returned as individual expressions so
    * callers project only what they need and the parquet scan prunes).
    */
  def charLen(c: Column): Column = length(c)
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
      greatest(length(c), lit(1))
  def digitRatio(c: Column): Column =
    length(regexp_replace(c, "[^0-9]", "")).cast("double") /
      greatest(length(c), lit(1))
  def upperRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Z]", "")).cast("double") /
      greatest(length(c), lit(1))
  def meanWordLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") /
      greatest(tokenCount(c), lit(1))

  /** English stopword ratio — the classic quality signal (high-quality
    * natural text has a stable stopword fraction; word salad does not).
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "from", "this", "be")

  def stopwordRatio(c: Column): Column =
    NativeHash.stopwordRatioColumn(lower(c), Stopwords)

  /** Composed-expression form of [[stopwordRatio]] — kept as the
    * spec-verified reference for the native kernel (the tree tokenizes
    * twice and isin-scans per token; the kernel is one pass).
    */
  private[graft] def stopwordRatioTree(c: Column): Column = {
    val ts = tokens(lower(c))
    size(filter(ts, t => t.isin(Stopwords.map(lit): _*))).cast("double") /
      greatest(size(ts), lit(1))
  }

  /** Composite quality score in [0,1]: weighted blend of the signals,
    * deterministic and engine-portable (plain arithmetic).
    */
  def qualityScore(c: Column): Column = {
    val lenOk = when(charLen(c).between(50, 5000), 1.0).otherwise(0.0)
    val punctOk =
      when(punctRatio(c) < 0.1, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c) > 0.05, 1.0).otherwise(0.0)
    val wordOk =
      when(meanWordLen(c).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk * 0.3 + punctOk * 0.2 + stopOk * 0.3 + wordOk * 0.2)
  }

  /** n-gram-heuristic language ID over a fixed stopword table: the
    * language with the most stopword hits wins; ties and zero-hit
    * documents resolve to "und". Deterministic, shuffle-free.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "une", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val ts = tokens(lower(c))
    LangMarkers.map { case (lang, words) =>
      lang -> size(filter(ts, t => t.isin(words.map(lit): _*)))
    }
  }

  def langId(c: Column): Column =
    NativeHash.langIdColumn(lower(c), LangMarkers)

  /** Composed-expression form of [[langId]] — kept as the spec-verified
    * reference for the native kernel (the tree re-tokenizes per
    * language; the kernel is one pass with a marker-map probe).
    */
  private[graft] def langIdTree(c: Column): Column = {
    val scores = langScores(c)
    // argmax with first-wins tiebreak in LangMarkers order
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) {
      case (w, (lang, s)) => w.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the casefolded, alnum-only text — the
    * standard normalize-then-hash near-exact dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  /** Canonical text normalization: control characters → space,
    * whitespace runs collapsed to one space, ends trimmed. The regexes
    * use only byte-class syntax valid in both Java regex and RE2, so
    * a SQL oracle replays them verbatim. (Unicode NFC is deliberately
    * NOT included here — [[nfcNormalize]] composes with it when the
    * corpus needs it.)
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(c, "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))

  /** Unicode NFC (canonical composition) — multilingual corpora need
    * it BEFORE fingerprinting/dedup: decomposed "café" (e + combining
    * acute) and precomposed "café" are different byte strings until
    * composed. Native kernel with an allocation-free already-normalized
    * fast path; DuckDB's `nfc_normalize` is the oracle equivalent.
    */
  def nfcNormalize(c: Column): Column = NativeHash.nfcColumn(c)

  /** [[fingerprint]] over NFC-composed text — the dedup key to use on
    * multilingual corpora (the ASCII-only strip in [[fingerprint]]
    * makes composed-vs-decomposed mismatches silent, not harmless:
    * "café" two ways yields two different fingerprints).
    */
  def fingerprintNfc(c: Column): Column = fingerprint(nfcNormalize(c))

  // ------------------------------------------------------ PII redaction

  /** PII patterns chosen to mean the same thing in Java regex and RE2
    * (no backrefs, no lookarounds) so the engine and any SQL oracle
    * redact identically. Order matters and is part of the contract:
    * emails first (their local part can contain digits a later pass
    * would chew on), then IPv4, then phone-ish digit runs.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\+?[0-9][0-9() .-]{6,}[0-9]" -> "<PHONE>")

  /** Mask emails, IPv4 addresses and phone-like digit runs. A chain of
    * codegen'd `regexp_replace`s — per-row, shuffle-free, scan-scale.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (col, (pat, tag)) =>
      regexp_replace(col, pat, tag)
    }

  /** Payment-card candidates: digit-bounded runs of 12–23 digits /
    * spaces / dashes. A regex alone cannot tell a card from any other
    * long number — candidates are VALIDATED by [[luhnSum]] before
    * redaction, so order IDs and timestamps survive while real card
    * numbers (which must Luhn-check) do not.
    */
  private[graft] val CardCandidatePattern: String =
    "[0-9][0-9 -]{10,21}[0-9]"

  /** Luhn checksum of a digit string: from the right, every second
    * digit doubles (minus 9 when > 9); valid numbers sum ≡ 0 mod 10.
    * Pure integer expression tree over substr/cast — replayable as
    * the identical list_transform/list_sum in any SQL engine.
    */
  private def luhnSum(digits: Column): Column = {
    val n = length(digits)
    aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d = digits.substr(n - i + lit(1), lit(1)).cast("int")
      acc + when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
  }

  /** Redact Luhn-valid card numbers (13–19 digits, separators
    * allowed) to `<CARD>`: extract candidates, keep the checksum
    * survivors, literal-replace each — all inside one expression
    * tree, map-only, no UDF. Invalid-checksum numbers are left for
    * later passes to interpret (a 16-digit non-card run may still be
    * a phone). Null in → null out.
    */
  def redactCards(c: Column): Column = {
    val cands = array_distinct(
      regexp_extract_all(c, lit(CardCandidatePattern), lit(0)))
    val valid = filter(cands, cand => {
      val digits = regexp_replace(cand, "[^0-9]", "")
      length(digits).between(13, 19) && luhnSum(digits) % 10 === 0
    })
    aggregate(valid, c, (acc, x) => replace(acc, x, lit("<CARD>")))
  }

  /** Full redaction chain with cards: emails first (the documented
    * [[PiiPatterns]] order contract), then Luhn-validated cards
    * (BEFORE the phone pass, which would otherwise swallow separated
    * card runs as phone numbers), then IPv4 + phones.
    */
  def redactPiiFull(c: Column): Column = {
    val (emailPat, emailTag) = PiiPatterns.head
    val afterCards =
      redactCards(regexp_replace(c, emailPat, emailTag))
    PiiPatterns.tail.foldLeft(afterCards) {
      case (cc, (p, tag)) => regexp_replace(cc, p, tag)
    }
  }

  /** IBAN candidates: country code + 2 check digits + 11–30 more
    * alphanumerics, single spaces allowed between characters (the
    * print grouping), word-bounded. Shape alone is not identity —
    * candidates are VALIDATED by the ISO 13616 [[ibanMod97]] checksum
    * before redaction, so invoice codes and near-miss strings
    * survive.
    */
  private[graft] val IbanCandidatePattern: String =
    "\\b[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]){11,30}\\b"

  /** ISO 13616 mod-97 residue of a rearranged IBAN (first four chars
    * moved to the end): digits fold as `acc·10 + d`, letters as
    * `acc·100 + (A=10…Z=35)`, reduced mod 97 at every step so the
    * accumulator never exceeds 9 634 — a pure integer expression
    * tree over substr/ascii, no UDF, replayable as the identical
    * encoded list_reduce in any SQL engine. Valid IBANs leave
    * residue 1.
    */
  private def ibanMod97(rearranged: Column): Column =
    aggregate(sequence(lit(1), length(rearranged)), lit(0L),
      (acc, i) => {
        val ch = ascii(rearranged.substr(i, lit(1)))
        when(ch.between(48, 57), (acc * 10 + (ch - 48)) % 97)
          .otherwise((acc * 100 + (ch - 55)) % 97)
      })

  /** Redact mod-97-valid IBANs (15–34 chars compact, print spacing
    * allowed) to `<IBAN>`: extract candidates, keep the checksum
    * survivors, literal-replace each — one expression tree, map-only,
    * no UDF; the [[redactCards]] recipe for the bank-account PII
    * class. Invalid-checksum candidates are left untouched.
    *
    * The greedy candidate regex can swallow FOLLOWING shaped tokens
    * ("GB29 … 19 REF7" matches as one candidate whose checksum then
    * fails — a silent leak of the real IBAN). Shaped junk can only
    * attach across spaces (`\b` blocks gluing), so each candidate is
    * re-validated at every SPACE-BOUNDARY PREFIX and the LONGEST
    * checksum-valid prefix is what gets redacted; trailing tokens
    * stay in place.
    *
    * In a full chain, run BEFORE the phone pass — a spaced IBAN's
    * digit tail is phone-shaped and would otherwise be
    * half-swallowed. Null in → null out.
    */
  def redactIbans(c: Column): Column =
    NativeHash.redactIbansColumn(c)

  /** The composed expression-tree form of [[redactIbans]], kept as
    * the semantics oracle the spec pins the native kernel against
    * (nested HOFs run interpreted — the kernel does the same work in
    * one JVM pass per row).
    */
  private[graft] def redactIbansTree(c: Column): Column = {
    val cands = array_distinct(
      regexp_extract_all(c, lit(IbanCandidatePattern), lit(0)))
    def checksumOk(p: Column): Column = {
      val compact = regexp_replace(p, " ", "")
      val r = concat(compact.substr(lit(5), length(compact) - 4),
        compact.substr(lit(1), lit(4)))
      length(compact).between(15, 34) && ibanMod97(r) === 1
    }
    def validPrefix(cand: Column): Column = {
      val toks = split(cand, " ")
      // PROPER prefixes only — the full candidate is handled by the
      // fast path below, so the common clean-IBAN case costs exactly
      // one checksum fold (HOFs are interpreted, not codegen'd: the
      // prefix ladder only runs when junk actually extended the
      // match). Guard the sequence: Spark's sequence(1, 0) steps
      // BACKWARD instead of being empty.
      val ks = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
        .otherwise(array().cast("array<int>"))
      val prefixes = transform(ks,
        k => array_join(slice(toks, lit(1), k), " "))
      val valid = filter(prefixes, checksumOk(_))
      when(size(valid) > 0, element_at(valid, -1)) // longest or null
    }
    val bests = array_distinct(filter(
      transform(cands, cand =>
        when(checksumOk(cand), cand).otherwise(validPrefix(cand))),
      _.isNotNull))
    aggregate(bests, c, (acc, x) => replace(acc, x, lit("<IBAN>")))
  }

  /** URL pattern meaning the same thing in Java regex and RE2 (no
    * lookarounds): scheme, host, optional path of non-space/non-quote
    * characters.
    */
  val UrlPattern: String =
    "https?://[A-Za-z0-9.-]+(/[^\\s\"'<>]*)?"

  /** All URLs appearing in the text, in order (array<string>). */
  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit(UrlPattern), lit(0))

  /** Multi-label public suffixes, loaded from the bundled snapshot
    * resource (`graft/public_suffixes.txt` — curated from the public
    * Mozilla Public Suffix List's ICANN section; the file documents
    * what an offline build can and cannot carry). A host whose last
    * TWO labels are one of these registers at the THIRD label:
    * "shop.brand.co.uk" → "brand.co.uk", never "co.uk" — a last-2
    * reduction would collapse every UK/AU/JP site onto one blocklist
    * key. The set rides into the expression as a literal in-set
    * (effectively broadcast), no join, no UDF. Callers with a newer
    * snapshot pass their own lists to [[registrableDomain]] directly.
    */
  lazy val PublicSuffixes: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffixes.txt")
    require(in != null, "graft/public_suffixes.txt resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .toVector
    finally in.close()
  }

  /** Two-label public suffixes (co.uk-class). */
  lazy val MultiPartSuffixes: Seq[String] =
    PublicSuffixes.filter(_.count(_ == '.') == 1)

  /** Three-label public suffixes (k12.ca.us-class). */
  lazy val ThreePartSuffixes: Seq[String] =
    PublicSuffixes.filter(_.count(_ == '.') == 2)

  /** Public-suffix-aware registrable domain of a (lowercased) host:
    * last two labels normally, last THREE when the last two are a
    * multi-label public suffix, last FOUR when the last three are —
    * longest-match-first, like the PSL algorithm. Pure codegen'd
    * expression — the suffix sets are literal in-set probes.
    */
  def registrableDomain(host: Column,
      suffixes: Seq[String] = MultiPartSuffixes,
      suffixes3: Seq[String] = ThreePartSuffixes): Column = {
    val parts = split(host, "\\.")
    val last2 = concat_ws(".", slice(parts, -2, 2))
    val last3 = concat_ws(".", slice(parts, -3, 3))
    when(size(parts) <= 2, host)
      .when(last3.isin(suffixes3.map(lit): _*) && size(parts) >= 4,
        concat_ws(".", slice(parts, -4, 4)))
      .when(last2.isin(suffixes.map(lit): _*) && size(parts) >= 3,
        last3)
      .otherwise(last2)
  }

  /** Registrable domains of the text's URLs: host lowercased, then
    * [[registrableDomain]] (public-suffix aware — "shop.brand.co.uk"
    * → "brand.co.uk", "sub.news.example.com" → "example.com").
    */
  def urlDomains(c: Column): Column =
    transform(extractUrls(c), u => {
      val host = regexp_replace(
        regexp_replace(lower(u), "^https?://", ""), "[/:].*$", "")
      registrableDomain(host)
    })

  /** Canonical URL for dedup keys and per-domain grouping: fragment
    * dropped, scheme + authority lowercased (path/query case is
    * significant and preserved), default ports (:80 http, :443 https)
    * stripped, tracking parameters (utm_*, gclid, fbclid) removed
    * with separators re-normalized. Non-absolute inputs (no
    * `scheme://`) pass through untouched. Pure codegen'd
    * regexp chain; every pattern is RE2-compatible (no lookaround, no
    * backrefs) so an independent engine can replicate it verbatim —
    * the q_url_normalize oracle does.
    *
    * Parameter ORDER is preserved, not sorted: `?a=1&b=2` and
    * `?b=2&a=1` stay distinct. Sorting would canonicalize harder but
    * silently merges URLs whose servers treat order as significant;
    * callers who want it can split/sort the query themselves.
    */
  def normalizeUrl(u: Column): Column = {
    val schemeAuth = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, s"($schemeAuth)", 1)),
      regexp_replace(noFrag, schemeAuth, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered,
        "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val noTrack = regexp_replace(noPort,
      "([?&])(?:utm_[^=&]*|gclid|fbclid)=[^&]*", "$1")
    val collapsed = regexp_replace(noTrack, "([?&])&+", "$1")
    val trimmed = regexp_replace(collapsed, "[?&]+$", "")
    when(u.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), trimmed).otherwise(u)
  }

  // ---------------------------------------------------- HTML extraction

  /** Crawl-page HTML → clean text: script/style blocks removed WITH
    * their contents, comments removed, remaining tags stripped, the
    * entities that dominate real pages decoded, then [[normalizeText]]
    * whitespace canonicalization. Deliberately regex-only — no DOM
    * parser on the scan path (a 100 TB crawl cleans in the projection,
    * codegen'd, shuffle-free), and every pattern means the same thing
    * in Java regex and RE2 (inline `(?is)` flags, lazy `.*?`, no
    * lookarounds) so a SQL oracle replays it verbatim. `&amp;` decodes
    * LAST: decoding it first would double-decode `&amp;lt;` into `<`.
    */
  /** Shared by the Column chain and the `graft_html_*` SQL builders
    * (which must construct RESOLVED catalyst trees — a Column cannot
    * convert to an expression inside an injected function).
    */
  private[graft] val HtmlBlockPatterns: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")
  private[graft] val HtmlTagPattern = "<[^>]+>"
  private[graft] val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
  private[graft] val HtmlTitlePattern =
    "(?is)<title[^>]*>([^<]*)</title>"
  // the captured group INCLUDES the quotes (stripped per element
  // afterwards): capturing both quote styles with one inner group
  // would need a backreference, which RE2 — hence any SQL oracle —
  // cannot replay
  private[graft] val HtmlHrefPattern =
    "(?i)href\\s*=\\s*(\"[^\"]*\"|'[^']*')"
  private[graft] val ControlCharPattern = "[\\x00-\\x1F\\x7F]"
  private[graft] val WsRunPattern = "\\s+"

  /** The cp1252 decodings of bytes 0x80–0x9F that DIFFER from
    * Latin-1 (which maps that range to control characters): the
    * smart-punctuation/currency block every Windows-mojibake digraph
    * lands in ('€' for 0x80, '™' for 0x99, 'œ' for 0x9C, …). Bytes
    * 0x81/0x8D/0x8F/0x90/0x9D are undefined in cp1252 and omitted.
    */
  private val Cp1252HighChars: String =
    "\\x{20AC}\\x{201A}\\x{0192}\\x{201E}\\x{2026}\\x{2020}\\x{2021}" +
      "\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}\\x{017D}" +
      "\\x{2018}\\x{2019}\\x{201C}\\x{201D}\\x{2022}\\x{2013}" +
      "\\x{2014}\\x{02DC}\\x{2122}\\x{0161}\\x{203A}\\x{0153}" +
      "\\x{017E}\\x{0178}"

  /** Encoding-damage signatures: the U+FFFD replacement character
    * (decoder already gave up) plus the classic
    * UTF-8-read-as-single-byte digraphs under BOTH common wrong
    * decoders — Latin-1 (continuation bytes become U+0080–U+00FF)
    * and cp1252 (bytes 0x80–0x9F become the smart-punctuation block,
    * [[Cp1252HighChars]]): 'Ã'/'Â' followed by a continuation-range
    * char (how every 2-byte UTF-8 sequence mis-decodes, e.g. 'Ã©'
    * and cp1252's 'Ã˜') and 'â' followed by TWO continuation-range
    * chars (3-byte sequences — Latin-1's 'â'+U+0080+… and cp1252's
    * 'â€¦'/'â€œ' family). `\x{...}` escapes are valid in both Java
    * regex and RE2, so a SQL oracle counts the same characters.
    * Legitimate accented text ('é', 'ü') never matches — the
    * signatures need the mis-decoded LEAD byte first, and the 'â'
    * alternative needs two consecutive continuation-class chars
    * after it, which no natural orthography produces.
    */
  private[graft] val MojibakePattern: String =
    "\\x{FFFD}" +
      s"|[\\x{00C3}\\x{00C2}][\\x{0080}-\\x{00FF}$Cp1252HighChars]" +
      s"|\\x{00E2}[\\x{0080}-\\x{00BF}$Cp1252HighChars]" +
      s"[\\x{0080}-\\x{00FF}$Cp1252HighChars]"

  /** Fraction of the text's characters inside mojibake sequences —
    * strip-and-measure ((len − len(stripped)) / len), one regex pass,
    * one divide: the cheap "this document was decoded with the wrong
    * charset" curation signal, engine-replayable.
    */
  def mojibakeCharFraction(c: Column): Column =
    (length(c) - length(regexp_replace(c, MojibakePattern, "")))
      .cast("double") / greatest(length(c), lit(1))

  /** cp1252 decodings of bytes 0x80–0x9F (the ones that differ from
    * Latin-1). Bytes undefined in cp1252 (0x81/8D/8F/90/9D) are
    * absent — [[sloppyChar]] falls back to the Latin-1 C1 control,
    * which is what real-world "sloppy cp1252" decoders (and hence
    * real mojibake) produce for them.
    */
  private val Cp1252Decode: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
    0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
    0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
    0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
    0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
    0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
    0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** How one byte of a UTF-8 sequence surfaces when the stream is
    * mis-decoded by the common single-byte decoders: 0x80–0x9F via
    * cp1252 (with the sloppy C1 fallback), everything else via
    * Latin-1 (identity to the code point).
    */
  private def sloppyChar(b: Int): Char =
    if (b >= 0x80 && b <= 0x9F) Cp1252Decode.getOrElse(b, b.toChar)
    else b.toChar

  /** The mis-decoded (mojibake) form of one character: its UTF-8
    * bytes re-read through [[sloppyChar]]. Exposed for tests and the
    * damage-synthesis side of oracle queries.
    */
  private[graft] def mojibakeOf(ch: Char): String =
    ch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => sloppyChar(b & 0xff)).mkString

  /** (mojibake digraph → intended char) repair table, generated from
    * the same byte mapping the damage performs — never hand-typed.
    * Coverage: the cp1252 smart-punctuation block (every char in
    * [[Cp1252HighChars]]) and the printable Latin-1 supplement
    * U+00A1–U+00FF — the entire range 2-byte UTF-8 mojibake lands
    * in. Ordering is load-bearing for a single sequential pass:
    * longest patterns first (3-byte before 2-byte so no short repair
    * bites a long digraph), then ascending target code point — which
    * makes one pass also repair DOUBLY-damaged 2-byte chars ('é' →
    * 'Ã©' → 'ÃƒÂ©': the 'Â©'→'©' repair at U+00A9 runs before
    * 'Ãƒ'→'Ã' at U+00C3, which runs before 'Ã©'→'é' at U+00E9).
    */
  val MojibakeRepairs: Seq[(String, String)] = {
    val high: Seq[Char] = Cp1252Decode.values.toSeq
    val targets = high ++ (0xA1 to 0xFF).map(_.toChar)
    val pairs = targets.map(ch => (mojibakeOf(ch), ch.toString))
    val (three, two) = pairs.partition(_._1.length == 3)
    three.sortBy(_._2) ++ two.sortBy(_._2)
  }

  /** ftfy-style encoding repair: undo UTF-8 text mis-decoded as
    * Latin-1/cp1252 by replacing each mojibake digraph with the
    * character it encodes — a literal sequential replace chain
    * (order documented on [[MojibakeRepairs]]), no regex, map-only,
    * SQL-replayable as the identical nested `replace` chain. One
    * pass repairs singly-damaged text of any mix plus doubly-damaged
    * 2-byte sequences; `passes = 2` also unwinds doubly-damaged
    * smart punctuation. Clean text is untouched — every pattern
    * needs a mis-decoded lead byte ('Ã','Â','Å','â','Ã¢',…) followed
    * by continuation-range chars, which no natural orthography
    * produces ([[MojibakePattern]]'s premise, shared here).
    */
  def fixEncoding(c: Column, passes: Int = 1): Column =
    (1 to passes).foldLeft(c)((acc, _) =>
      MojibakeRepairs.foldLeft(acc) { case (cc, (m, t)) =>
        replace(cc, lit(m), lit(t))
      })

  def htmlToText(c: Column): Column = {
    val noBlocks = HtmlBlockPatterns.foldLeft(c)(
      (col, p) => regexp_replace(col, p, " "))
    val noTags = regexp_replace(noBlocks, HtmlTagPattern, " ")
    val decoded = HtmlEntities.foldLeft(noTags) {
      case (col, (ent, ch)) => replace(col, lit(ent), lit(ch))
    }
    normalizeText(decoded)
  }

  /** The page title ('' when absent), whitespace-normalized. */
  def htmlTitle(c: Column): Column =
    normalizeText(regexp_extract(c, HtmlTitlePattern, 1))

  /** All href targets — double- OR single-quoted (real crawl HTML
    * uses both) — in document order, quotes stripped.
    */
  def htmlLinks(c: Column): Column =
    transform(regexp_extract_all(c, lit(HtmlHrefPattern), lit(1)),
      s => s.substr(lit(2), length(s) - 2))

  // ------------------------------------------------- script detection

  /** BMP ranges per script, in PRIORITY order (ties in [[dominantScript]]
    * resolve to the earlier entry). `\x{...}` escapes are valid in both
    * Java regex and RE2, so a SQL oracle counts the same characters.
    * Complements [[langId]]: marker words need tokenizable Latin-ish
    * text; script ratios classify CJK/Cyrillic/Arabic content where
    * whitespace tokenization or marker tables fail.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin"      -> "A-Za-z",
    "cyrillic"   -> "\\x{0400}-\\x{04FF}",
    "greek"      -> "\\x{0370}-\\x{03FF}",
    "arabic"     -> "\\x{0600}-\\x{06FF}",
    "hebrew"     -> "\\x{0590}-\\x{05FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "han"        -> "\\x{4E00}-\\x{9FFF}",
    "hangul"     -> "\\x{AC00}-\\x{D7AF}",
    "kana"       -> "\\x{3040}-\\x{30FF}",
    "thai"       -> "\\x{0E00}-\\x{0E7F}")

  /** Count of the column's characters inside one script's range —
    * strip-and-measure, so an independent engine replays it exactly.
    */
  def scriptCount(c: Column, script: String): Column = {
    val range = ScriptRanges.toMap.getOrElse(script,
      throw new IllegalArgumentException(s"unknown script '$script'"))
    length(regexp_replace(c, s"[^$range]", ""))
  }

  /** The script owning the most characters ('und' when no script
    * character appears); ties go to the earlier [[ScriptRanges]]
    * entry — the same first-match CASE chain a SQL oracle writes.
    */
  def dominantScript(c: Column): Column = {
    val counts = ScriptRanges.map { case (name, _) =>
      name -> scriptCount(c, name)
    }
    val m = greatest(counts.map(_._2): _*)
    val chain = counts.foldLeft(when(m === 0, lit("und"))) {
      case (w, (name, cnt)) => w.when(cnt === m, lit(name))
    }
    chain.otherwise(lit("und"))
  }

  /** BCP-47 script subtag per [[ScriptRanges]] name. */
  val ScriptSubtags: Seq[(String, String)] = Seq(
    "latin" -> "Latn", "cyrillic" -> "Cyrl", "greek" -> "Grek",
    "arabic" -> "Arab", "hebrew" -> "Hebr", "devanagari" -> "Deva",
    "han" -> "Hani", "hangul" -> "Hang", "kana" -> "Kana",
    "thai" -> "Thai")

  /** Composite language classification: the marker-word [[langId]]
    * where it can speak, else a BCP-47-style `und-<Script>` tag from
    * [[dominantScript]] — so Chinese/Korean/Thai/Russian content gets
    * 'und-Hani'/'und-Hang'/'und-Thai'/'und-Cyrl' instead of a bare
    * 'und' (honest: language unknown, script known — a script tag is
    * exactly what routing to per-script pipelines needs). Latin-script
    * text the marker table cannot place stays 'und' — claiming a
    * script there adds nothing (the marker table IS the Latin-script
    * classifier).
    */
  def langIdFull(c: Column): Column = {
    val base = langId(c)
    // one counts chain emitting tags DIRECTLY — routing through
    // dominantScript would re-evaluate its whole 10-regex expression
    // once per mapping branch (measured 23 s vs 0.6 s on the bench
    // corpus); same first-match priority as dominantScript, with the
    // latin branch mapping to the honest 'und'
    val tagMap = ScriptSubtags.toMap
    val counts = ScriptRanges.map { case (name, _) =>
      name -> scriptCount(c, name)
    }
    val m = greatest(counts.map(_._2): _*)
    val fallback = counts.foldLeft(when(m === 0, lit("und"))) {
      case (w, (name, cnt)) =>
        w.when(cnt === m,
          if (name == "latin") lit("und")
          else lit(s"und-${tagMap(name)}"))
    }.otherwise(lit("und"))
    when(base =!= "und", base).otherwise(fallback)
  }

  // ------------------------------------- repetition signals (Gopher-ish)

  /** Fraction of lines that are repeats of an earlier line (0 for a
    * doc of unique lines, →1 for a doc of one line copied n times).
    * One-pass native kernel; [[duplicateLineFractionTree]] is the
    * spec-verified reference.
    */
  def duplicateLineFraction(c: Column): Column =
    NativeHash.dupLineStatsColumn(c).getField("dup_line_frac")

  /** Fraction of characters living in lines that occur more than once
    * — the Gopher "fraction of characters in duplicate lines" signal.
    * One-pass native kernel; [[duplicateLineCharFractionTree]] is the
    * spec-verified reference.
    */
  def duplicateLineCharFraction(c: Column): Column =
    NativeHash.dupLineStatsColumn(c).getField("dup_char_frac")

  private[graft] def duplicateLineFractionTree(c: Column): Column = {
    val lines = split(c, "\n")
    (size(lines) - size(array_distinct(lines))).cast("double") /
      greatest(size(lines), lit(1))
  }

  /** Tree reference for the kernel. The per-line occurrence count is a
    * quadratic HOF whose lambda additionally re-derives the line array
    * per element in the interpreted path — reference only, never the
    * hot path.
    */
  private[graft] def duplicateLineCharFractionTree(c: Column): Column = {
    val lines = split(c, "\n")
    val dupChars = aggregate(lines, lit(0L), (acc, l) =>
      acc + when(size(filter(lines, x => x === l)) > 1, length(l))
        .otherwise(lit(0)).cast("long"))
    dupChars.cast("double") / greatest(length(c), lit(1))
  }

  /** Fraction of characters covered by the most repetitive word
    * 2-gram: max over distinct REPEATED bigrams (count ≥ 2) of
    * count(g)·len(g), divided by the doc length; 0 when no bigram
    * repeats (a unique-bigram doc is not repetitive, however short).
    * count·len is maximized directly — the max of a set of longs needs
    * no tie-break.
    */
  def topBigramCharFraction(c: Column): Column =
    NativeHash.repeatedNGramCharFracColumn(c, 2)

  /** Tree reference for [[topBigramCharFraction]]'s kernel — the
    * distinct×filter double loop re-derives the gram array per element
    * in the interpreted path (O(grams³)); reference only.
    */
  private[graft] def topBigramCharFractionTree(c: Column): Column = {
    val grams = wordNGrams(c, 2)
    val best = array_max(transform(array_distinct(grams), g => {
      val cnt = size(filter(grams, x => x === g))
      when(cnt > 1, cnt * length(g)).otherwise(0).cast("long")
    }))
    best.cast("double") / greatest(length(c), lit(1))
  }

  /** Deflate compression ratio (compressed/original bytes) — the
    * information-density signal: template spam compresses far below
    * natural prose, catching long-period repetition that fixed-n
    * n-gram signals miss. Engine-internal (no SQL oracle); see
    * [[graft.functions.CompressionRatio]].
    */
  def compressionRatio(c: Column): Column =
    NativeHash.compressionRatioColumn(c)

  // ------------------------------------------------- quality filtering

  /** One rule of the composite filter: name + pass-predicate. */
  final case class QualityRule(name: String, pass: Column => Column)

  /** Gopher-style document filter rules (each encodes a published
    * heuristic; thresholds are the classic defaults, callers override
    * by passing their own rule list to [[qualityReasons]]).
    */
  def defaultQualityRules: Seq[QualityRule] = Seq(
    QualityRule("word_count", c => tokenCount(c).between(5, 100000)),
    QualityRule("mean_word_len", c => meanWordLen(c).between(2.0, 12.0)),
    QualityRule("digit_ratio", c => digitRatio(c) < 0.3),
    QualityRule("upper_ratio", c => upperRatio(c) < 0.3),
    QualityRule("stopword", c => stopwordRatio(c) > 0.0),
    QualityRule("repetition", c => topBigramCharFraction(c) < 0.2))

  /** Comma-joined names of the rules a document FAILS (empty string =
    * keep, null in = null out — concat_ws alone would swallow the null
    * into "", silently reading as "passed"). A string, not an array,
    * so the result is directly comparable in any SQL engine.
    */
  def qualityReasons(c: Column,
      rules: Seq[QualityRule] = defaultQualityRules): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(concat_ws(",", rules.map(r =>
        when(!r.pass(c), lit(r.name)).otherwise(lit(null))): _*))

  /** Keep-flag form of [[qualityReasons]]. */
  def qualityKeep(c: Column,
      rules: Seq[QualityRule] = defaultQualityRules): Column =
    rules.map(_.pass(c)).reduce(_ && _)
}
