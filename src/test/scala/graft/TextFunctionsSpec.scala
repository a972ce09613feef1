package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    Seq("x").toDF("d").select(c).collect()(0).get(0).asInstanceOf[A]

  test("tokenCount") {
    val df = Seq("  the quick  brown fox ").toDF("t")
    assert(df.select(T.tokenCount(col("t"))).collect()(0).getInt(0) == 4)
  }

  test("charShingles produce len-n+1 shingles") {
    val df = Seq("abcdef").toDF("t")
    val sh = df.select(T.charShingles(col("t"), 3)).collect()(0)
      .getSeq[String](0)
    assert(sh == Seq("abc", "bcd", "cde", "def"))
  }

  test("wordNGrams") {
    val df = Seq("a b c d").toDF("t")
    val g = df.select(T.wordNGrams(col("t"), 2)).collect()(0)
      .getSeq[String](0)
    assert(g == Seq("a b", "b c", "c d"))
  }

  test("quality signals on clean vs junk text") {
    val clean = "The quick brown fox jumps over the lazy dog and then " +
      "it runs away to the forest with a big smile on its face today."
    val junk = "@@@@ #### $$$$ %%%% ^^^^ &&&&"
    val df = Seq((clean, junk)).toDF("clean", "junk")
    val r = df.select(
      T.qualityScore(col("clean")).as("qc"),
      T.qualityScore(col("junk")).as("qj"),
      T.stopwordRatio(col("clean")).as("sc")).collect()(0)
    assert(r.getDouble(0) > r.getDouble(1))
    assert(r.getDouble(2) > 0.2)
  }

  test("langId picks the dominant stopword language") {
    val df = Seq(
      ("the cat and the dog of the house", "en"),
      ("el gato y la casa de los perros que", "es"),
      ("der hund und die katze ist ein tier", "de"),
      ("12345 67890", "und")).toDF("t", "want")
    val got = df.select(T.langId(col("t")).as("l"), col("want"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (l, want) => assert(l == want, s"got $l want $want") }
  }

  test("fingerprint normalizes case and punctuation") {
    val df = Seq(("Hello, World!", "hello world", "other")).toDF("a", "b", "c")
    val r = df.select(T.fingerprint(col("a")).as("fa"),
      T.fingerprint(col("b")).as("fb"),
      T.fingerprint(col("c")).as("fc")).collect()(0)
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) != r.getString(2))
  }

  test("bpeishTokenCount splits letter/digit/punct transitions") {
    val df = Seq("abc123 def!").toDF("t")
    // abc | 123 | def | !
    assert(df.select(T.bpeishTokenCount(col("t"))).collect()(0)
      .getInt(0) == 4)
  }

  test("normalizeText collapses whitespace and strips control chars") {
    val got = Seq("\t hello  world \r\n again  ")
      .toDF("t").select(T.normalizeText(col("t"))).as[String]
      .collect()(0)
    assert(got == "hello world again")
  }

  test("extractUrls and urlDomains reduce to registrable domains") {
    val df = Seq(
      "read https://sub.news.example.com/a/b and http://foo.org",
      "bare host https://single or none",
      "no urls at all here",
      // public-suffix path: co.uk registers at the THIRD label
      "uk https://shop.brand.co.uk/p and https://bbc.co.uk/news",
      "au http://www.example.com.au:8080/x",
      // 3-label suffixes: k12.ca.us registers at the FOURTH label
      "us https://www.district.k12.ca.us/home and http://k12.ca.us/x",
      "au3 https://www.school.nsw.edu.au/enrol").toDF("t")
    val got = df.select(T.urlDomains(col("t"))).as[Seq[String]]
      .collect()
    assert(got(0) == Seq("example.com", "foo.org"))
    assert(got(1) == Seq("single"))
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq("brand.co.uk", "bbc.co.uk"))
    assert(got(4) == Seq("example.com.au"))
    assert(got(5) == Seq("district.k12.ca.us", "k12.ca.us"))
    assert(got(6) == Seq("school.nsw.edu.au"))
    // snapshot resource loaded and well-formed
    assert(T.MultiPartSuffixes.size > 500 &&
      T.ThreePartSuffixes.size > 100)
    assert(T.PublicSuffixes.forall(s =>
      s.count(_ == '.') >= 1 && s.count(_ == '.') <= 2))
  }

  test("redactPii masks emails, IPv4s and phone runs, in order") {
    val df = Seq(
      "mail bob.smith+x@sub.example.co.uk now",
      "server at 192.168.001.42 down",
      "call +1 (555) 010-9999 today",
      "edge 999.999.999.999 still ip-shaped",
      "clean text with no pii at all").toDF("t")
    val got = df.select(T.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> down")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "edge <IP> still ip-shaped")
    assert(got(4) == "clean text with no pii at all")
  }

  test("redactPii: email wins over phone on the digits it contains") {
    // the local part is digit-heavy; a phone-first ordering would chew
    // it — the contract fixes email first
    val got = Seq("ref 0123456789@example.com end").toDF("t")
      .select(T.redactPii(col("t"))).as[String].collect()(0)
    assert(got == "ref <EMAIL> end")
  }

  test("repetition signals on crafted multi-line docs") {
    val unique = "aa\nbb\ncc\ndd"          // no dup lines
    val half   = "aa\nbb\naa\ncc"          // 'aa' twice: 4 lines, 3 distinct
    val r = Seq((unique, half)).toDF("u", "h").select(
      T.duplicateLineFraction(col("u")).as("du"),
      T.duplicateLineFraction(col("h")).as("dh"),
      T.duplicateLineCharFraction(col("h")).as("ch")).collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-9)
    // dup chars = 2+2 of 11 total chars (incl 3 newlines)
    assert(math.abs(r.getDouble(2) - 4.0 / 11.0) < 1e-9)
  }

  test("topBigramCharFraction flags a boilerplate-bigram doc") {
    // "x y" appears 3x (len 3): best = 9 over 17 chars
    val rep  = "x y x y x y a b c"
    val uniq = "the quick brown fox jumps over a lazy dog"
    val r = Seq((rep, uniq)).toDF("r", "u").select(
      T.topBigramCharFraction(col("r")).as("fr"),
      T.topBigramCharFraction(col("u")).as("fu")).collect()(0)
    assert(math.abs(r.getDouble(0) - 9.0 / 17.0) < 1e-9)
    assert(r.getDouble(1) == 0.0) // nothing repeats -> not repetitive
  }

  test("nfcNormalize composes decomposed accents; fingerprints then agree") {
    val composed   = "caf\u00e9 \u00fcber"
    val decomposed = "cafe\u0301 u\u0308ber"
    val df = Seq((1L, composed), (2L, decomposed), (3L, null))
      .toDF("id", "t")
    val rows = df.select(col("id"),
        T.nfcNormalize(col("t")).as("n"),
        T.fingerprintNfc(col("t")).as("fp"),
        T.fingerprint(col("t")).as("fp_raw"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == rows(2L).getString(1))
    assert(rows(1L).getString(1) == composed) // NFC of composed = itself
    assert(rows(1L).getString(2) == rows(2L).getString(2))
    // the raw fingerprint is exactly the trap NFC fixes: the combining
    // mark strips but its base letter survives, so the forms diverge
    assert(rows(1L).getString(3) != rows(2L).getString(3))
    assert(rows(3L).getString(1) == null && rows(3L).getString(2) == null)
  }

  test("graft_nfc is reachable from SQL") {
    graft.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS n").collect()(0)
    assert(out.getString(0) == "caf\u00e9")
  }

  test("compressionRatio separates prose from template spam") {
    val prose = "The quick brown fox jumps over the lazy dog while " +
      "seventeen magpies argue about breakfast near the old mill."
    val spam = Seq.fill(40)("click here to subscribe now").mkString(" ")
    val r = Seq((prose, spam, "", null: String))
      .toDF("p", "s", "e", "n")
      .select(T.compressionRatio(col("p")).as("rp"),
        T.compressionRatio(col("s")).as("rs"),
        T.compressionRatio(col("e")).as("re"),
        T.compressionRatio(col("n")).as("rn")).collect()(0)
    assert(r.getDouble(0) > 0.5)          // prose barely compresses
    assert(r.getDouble(1) < 0.2)          // template spam collapses
    assert(r.getDouble(0) > r.getDouble(1))
    assert(r.getDouble(2) == 1.0)         // empty -> 1.0, no div by 0
    assert(r.isNullAt(3))                 // null in, null out
  }

  test("qualityKeep/qualityReasons agree and name the failed rules") {
    val good = "the quick brown fox jumps over the lazy dog again today"
    val short = "tiny doc"                       // fails word_count
    val salad = "zz zz zz zz zz zz"              // no stopwords + repetitive
    val df = Seq(good, short, salad).toDF("t")
    val rows = df.select(T.qualityKeep(col("t")).as("k"),
      T.qualityReasons(col("t")).as("r")).collect()
    assert(rows(0).getBoolean(0) && rows(0).getString(1) == "")
    assert(!rows(1).getBoolean(0))
    assert(rows(1).getString(1).contains("word_count"))
    assert(!rows(2).getBoolean(0))
    assert(rows(2).getString(1).contains("stopword"))
    assert(rows(2).getString(1).contains("repetition"))
    // reasons non-empty exactly when keep is false
    rows.foreach(r => assert(r.getBoolean(0) == r.getString(1).isEmpty))
  }

  test("htmlToText: blocks removed with content, entities decode last") {
    val html = "<html><head><title>T</title>" +
      "<SCRIPT type='x'>if (a<b) { alert('&amp;'); }</SCRIPT>" +
      "<style>p { color: red; }</style></head>" +
      "<body><!-- secret --><p>Hello &amp;lt;world&gt;!</p>" +
      "<div>tab\there</div></body></html>"
    val out = Seq(html).toDF("h")
      .select(T.htmlToText(col("h"))).as[String].collect()(0)
    // &amp;lt; decodes to literal "&lt;" (NOT "<" — amp decodes last);
    // script body incl. its bare '<' and entity is gone; comment gone
    assert(out == "T Hello &lt;world>! tab here")
  }

  test("htmlTitle and htmlLinks extraction") {
    val html = "<html><head><title> My  Page </title></head><body>" +
      "<a HREF=\"https://a.com/x\">a</a>" +
      "<a href = \"https://b.com/y?q=1\">b</a>" +
      "<a href='https://single.quoted/also'>c</a>" +
      "<a href=\"it's\">mixed-quote content stays intact</a>" +
      "</body></html>"
    val (title, links) = Seq(html).toDF("h")
      .select(T.htmlTitle(col("h")), T.htmlLinks(col("h")))
      .as[(String, Seq[String])].collect()(0)
    assert(title == "My Page")
    // BOTH quote styles, document order, case-insensitive attr name,
    // quotes stripped, opposite-style quote inside a value preserved
    assert(links == Seq("https://a.com/x", "https://b.com/y?q=1",
      "https://single.quoted/also", "it's"))
    // no title, malformed unclosed tag: empty title, text still sane
    val bad = "<body><p>hi<p>there</body"
    val (t2, txt) = Seq(bad).toDF("h")
      .select(T.htmlTitle(col("h")), T.htmlToText(col("h")))
      .as[(String, String)].collect()(0)
    assert(t2 == "")
    // the unclosed trailing tag is not a tag; it survives as text
    assert(txt == "hi there</body")
  }

  test("dominantScript: per-script counts, ties, mixed text, und") {
    val cases = Seq(
      ("hello world", "latin"),
      ("Привет мир", "cyrillic"),
      ("你好世界", "han"),
      ("こんにちは世界", "kana"), // 5 kana beat 2 han
      ("안녕하세요", "hangul"),
      ("مرحبا بالعالم", "arabic"),
      ("שלום עולם", "hebrew"),
      ("नमस्ते दुनिया", "devanagari"),
      ("γεια σου κόσμε", "greek"),
      ("สวัสดีชาวโลก", "thai"),
      ("abc สวัสดี", "thai"), // 6 thai > 3 latin
      ("12345 .,!?", "und"), // digits/punct belong to no script
      ("", "und"),
      ("ab Привет", "cyrillic"), // 6 cyrillic > 2 latin
      ("abc где", "latin")) // 3-3 tie -> earlier range order wins
    val out = cases.map(_._1).toDF("t")
      .select(T.dominantScript(col("t"))).as[String].collect()
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"for '$in'") }
    // counts are per-range character counts
    val n = Seq("ab 你好 cd").toDF("t").select(
      T.scriptCount(col("t"), "latin"),
      T.scriptCount(col("t"), "han")).collect()(0)
    assert(n.getInt(0) == 4 && n.getInt(1) == 2)
    intercept[IllegalArgumentException] {
      T.scriptCount(col("t"), "klingon")
    }
  }

  test("normalizeUrl canonicalizes case, ports, fragments, tracking") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, path case preserved, :80 stripped
      ("HTTP://WWW.Example.COM:80/Path/File?id=3#frag",
        "http://www.example.com/Path/File?id=3"),
      // :443 only strips for https
      ("HTTPS://a.example.com:443/x", "https://a.example.com/x"),
      ("http://a.example.com:443/x", "http://a.example.com:443/x"),
      // non-default port survives
      ("http://a.example.com:8080/x", "http://a.example.com:8080/x"),
      // tracking-params removal renormalizes separators
      ("http://e.com/p?utm_source=a&id=1&utm_campaign=b&q=2",
        "http://e.com/p?id=1&q=2"),
      ("http://e.com/p?utm_source=a&utm_medium=b", "http://e.com/p"),
      ("http://e.com/p?id=1&fbclid=xyz", "http://e.com/p?id=1"),
      ("http://e.com/p?gclid=1&id=2", "http://e.com/p?id=2"),
      // parameter order preserved, never sorted
      ("http://e.com/p?b=2&a=1", "http://e.com/p?b=2&a=1"),
      // not an absolute URL: untouched
      ("Not a URL at all", "Not a URL at all"),
      ("/relative/path?utm_source=x", "/relative/path?utm_source=x"))
    val out = cases.map(_._1).toDF("u")
      .select(graft.functions.TextFunctions.normalizeUrl(col("u")))
      .as[String].collect()
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"for $in") }
  }

  test("langIdFull: markers win, scripts fill the und gap, Latin " +
      "stays honest und") {
    val cases = Seq(
      ("the cat and the dog of the house", "en"),
      ("你好世界测试", "und-Hani"),
      ("Привет мир",
        "und-Cyrl"),
      ("สวัสดี", "und-Thai"),
      ("xqzzqx bvkwpl ncrtmd", "und"), // latin but unplaceable
      ("12345 67890", "und"))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.TextFunctions.langIdFull(col("t")))
      .as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"for '$in'") }
  }

  test("mojibakeCharFraction flags damage, never clean accents") {
    val cases = Seq(
      // UTF-8 'é' read as Latin-1: Ã + ©  (4 damaged chars of 8)
      ("caf\u00c3\u00a9\u00c3\u00a9", 4.0 / 7),
      // replacement character
      ("ab\ufffdcd", 1.0 / 5),
      // mis-decoded right smart quote: â + U+0080 + U+0099
      ("itâs", 3.0 / 6),
      // legitimate accents and real smart quotes: clean
      ("caf\u00e9 r\u00e9sum\u00e9 na\u00efve", 0.0),
      ("it\u2019s \u201cquoted\u201d", 0.0),
      ("plain ascii", 0.0),
      ("", 0.0))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.TextFunctions
        .mojibakeCharFraction(col("t")))
      .as[Double].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"for '$in'") }
  }

  test("redactCards: Luhn gate separates cards from long numbers") {
    def red(s: String): String = Seq(s).toDF("t")
      .select(T.redactCards(col("t"))).as[String].collect()(0)
    // industry test numbers, three separator styles
    assert(red("pay 4111 1111 1111 1111 now") == "pay <CARD> now")
    assert(red("mc 5555-5555-5555-4444 used") == "mc <CARD> used")
    assert(red("amex 378282246310005 ok") == "amex <CARD> ok")
    // checksum near-miss survives
    assert(red("order 4111 1111 1111 1112 kept") ==
      "order 4111 1111 1111 1112 kept")
    // length gate: Luhn-valid but 12 digits = not a card; 13 is
    assert(red("ref 000000000000 x") == "ref 000000000000 x")
    assert(red("ref 0000000000000 x") == "ref <CARD> x")
    // two cards in one doc, plus null passthrough
    assert(red("a 4111111111111111 b 378282246310005 c") ==
      "a <CARD> b <CARD> c")
    val n = Seq((1, null: String)).toDF("i", "t")
      .select(T.redactCards(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("redactIbans: mod-97 gate separates IBANs from shaped codes") {
    def red(s: String): String = Seq(s).toDF("t")
      .select(T.redactIbans(col("t"))).as[String].collect()(0)
    // valid IBANs: compact, print-spaced, letter-bearing BBANs
    assert(red("acct DE89370400440532013000 e") == "acct <IBAN> e")
    assert(red("acct GB29 NWBK 6016 1331 9268 19 e") ==
      "acct <IBAN> e")
    assert(red("wire FR1420041010050500013M02606 e") ==
      "wire <IBAN> e")
    assert(red("nl NL91ABNA0417164300 e") == "nl <IBAN> e")
    // one-digit-off near-miss survives (checksum, not shape)
    assert(red("near DE89370400440532013001 e") ==
      "near DE89370400440532013001 e")
    // transposition (the error class mod-97 exists to catch)
    assert(red("x DE89370400440532031000 y") ==
      "x DE89370400440532031000 y")
    // too short for any IBAN even if it matched the shape
    assert(red("ref AB12CDEF kept") == "ref AB12CDEF kept")
    // two in one doc + null passthrough
    assert(red("a DE89370400440532013000 b NL91ABNA0417164300 c") ==
      "a <IBAN> b <IBAN> c")
    // the greedy-swallow case: a following shaped token (uppercase /
    // digits) extends the regex match, but the space-boundary prefix
    // search still finds and redacts the real IBAN
    assert(red("acct GB29 NWBK 6016 1331 9268 19 REF7 eom") ==
      "acct <IBAN> REF7 eom")
    assert(red("pay DE89370400440532013000 2024 now") ==
      "pay <IBAN> 2024 now")
    // ...and a shaped-but-invalid run stays fully untouched
    assert(red("id GB00 AAAA 0000 0000 0000 00 X9 v") ==
      "id GB00 AAAA 0000 0000 0000 00 X9 v")
    // native kernel == expression tree on every case above plus the
    // adversarial ones (the tree is the pinned semantics oracle)
    val probes = Seq(
      "acct DE89370400440532013000 e",
      "acct GB29 NWBK 6016 1331 9268 19 e",
      "acct GB29 NWBK 6016 1331 9268 19 REF7 eom",
      "near DE89370400440532013001 e",
      "a DE89370400440532013000 b NL91ABNA0417164300 c",
      "pay DE89370400440532013000 2024 now",
      "id GB00 AAAA 0000 0000 0000 00 X9 v",
      "ref AB12CDEF kept", "")
    val both = probes.toDF("t")
      .select(T.redactIbans(col("t")),
        T.redactIbansTree(col("t")))
      .as[(String, String)].collect()
    assert(both.forall(p => p._1 == p._2))
    val n = Seq((1, null: String)).toDF("i", "t")
      .select(T.redactIbans(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("redactPiiFull: cards redact BEFORE the phone pass") {
    val got = Seq("call +1 (555) 010-1234 or pay" +
      " 4111 1111 1111 1111 from 10.1.2.3 mail a@b.io").toDF("t")
      .select(T.redactPiiFull(col("t"))).as[String].collect()(0)
    assert(got == "call <PHONE> or pay <CARD> from <IP> mail <EMAIL>")
  }

  test("fixEncoding repairs Latin-1/cp1252 mojibake, leaves clean text") {
    def fix(s: String, passes: Int = 1): String =
      Seq(s).toDF("t")
        .select(T.fixEncoding(col("t"), passes)).as[String].collect()(0)
    // 2-byte accents, 3-byte smart punctuation, cp1252 2-byte, and
    // the undefined-cp1252-byte quote (U+201D -> â + € + U+009D)
    assert(fix("cafÃ© naÃ¯ve") == "café naïve")
    assert(fix("itâ€™s â€œq" +
      "â€") == "it’s “q”")
    assert(fix("â€¦ Å¡kola " +
      "â‚¬5") == "… škola €5")
    // clean text — accents, real smart quotes, ascii — untouched
    for (s <- Seq("café résumé naïve", "it’s “quoted”",
        "plain ascii", ""))
      assert(fix(s) == s)
    // doubly-damaged 2-byte char repairs in ONE pass (order property)
    assert(fix("ÃƒÂ©") == "é")
    // doubly-damaged smart punctuation needs the second pass
    val dd = "â€™".flatMap(T.mojibakeOf) // '’' twice
    assert(fix(dd, 1) == "â€™")
    assert(fix(dd, 2) == "’")
    // repaired text no longer reads as damaged
    val moj = "waitâ€¦ cafÃ©"
    val frac = Seq(moj).toDF("t")
      .select(T.mojibakeCharFraction(T.fixEncoding(col("t"))))
      .as[Double].collect()(0)
    assert(frac == 0.0)
  }

  test("MojibakeRepairs is generated, complete, and well-ordered") {
    val rep = T.MojibakeRepairs
    assert(rep.size == 27 + 95) // cp1252 high block + U+00A1..U+00FF
    assert(rep.toMap.apply("Ã©") == "é")
    assert(rep.forall { case (m, t) =>
      (m.length == 2 || m.length == 3) && t.length == 1 })
    // all long patterns strictly before all short ones
    val firstTwo = rep.indexWhere(_._1.length == 2)
    assert(rep.take(firstTwo).forall(_._1.length == 3) &&
      rep.drop(firstTwo).forall(_._1.length == 2))
    // derivation round-trip: every pair is (mojibakeOf(t), t)
    assert(rep.forall { case (m, t) => T.mojibakeOf(t(0)) == m })
  }

  test("hashingVector matches the driver-side hash60 reference") {
    val dim = 32
    def refVec(text: String): Seq[Long] = {
      val md  = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Long](dim)
      text.trim.split("\\s+", -1).foreach { tok =>
        val h = graft.functions.NativeHash
          .hash60(tok.getBytes("UTF-8"), md)
        val sign = if (((h / dim) & 1L) == 1L) -1L else 1L
        out((h % dim).toInt) += sign
      }
      out.toSeq
    }
    val texts = Seq("the quick brown fox", "the the the",
      "  padded   whitespace  ", "", "one", "ünïcode tökens")
    val got = texts.toDF("text")
      .select(graft.functions.TextFunctions
        .hashingVector(col("text"), dim))
      .as[Seq[Long]].collect()
    got.zip(texts).foreach { case (g, t) =>
      assert(g == refVec(t), s"for '$t'") }
  }

  test("hashingVector: total |weight| mass never exceeds the token " +
      "count and repeated tokens accumulate") {
    val df = Seq("a b a b a").toDF("text")
    val v = df.select(graft.functions.TextFunctions
        .hashingVector(col("text"), 64))
      .as[Seq[Long]].collect()(0)
    assert(v.map(math.abs).sum <= 5)
    // 'a' appears 3 times, 'b' twice: the two nonzero coordinates
    // carry |3| and |2| (distinct buckets for this dim) or a merged
    // residue if they collide — either way mass parity holds
    assert(v.map(math.abs).max >= 2)
  }
}
