package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** RFC 9309 semantics: grouping, agent specificity, longest-pattern
  * precedence, wildcard/$ matching, the de-facto crawl-delay and
  * sitemap fields, and crawl-by-default on junk.
  */
class RobotsSpec extends AnyFunSuite {

  private def parse(s: String) =
    Robots.parse(s.getBytes("UTF-8")).get

  test("grouping: consecutive user-agents share rules; a new agent " +
      "line after rules opens a new group") {
    val r = parse(
      """User-agent: a
        |User-agent: b
        |Disallow: /x
        |User-agent: c
        |Disallow: /y
        |""".stripMargin)
    assert(r.groups.length == 2)
    assert(r.groups(0).agents == Seq("a", "b"))
    assert(r.groups(0).rules == Seq(Robots.Rule(false, "/x")))
    assert(r.groups(1).agents == Seq("c"))
    // both a and b are governed by the first group
    assert(!Robots.allowed(r, "a/1.0", "/x/page"))
    assert(!Robots.allowed(r, "B-bot", "/x/page"))
    assert(Robots.allowed(r, "a/1.0", "/y")) // c's rule, not a's
    assert(!Robots.allowed(r, "c", "/y"))
  }

  test("agent selection: longest named match beats *; * applies " +
      "only when nothing matches") {
    val r = parse(
      """User-agent: bot
        |Disallow: /short
        |User-agent: graftbot
        |Disallow: /long
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    // "graftbot" (8) beats "bot" (3); the star group is ignored
    assert(Robots.allowed(r, "GraftBot/2.1", "/short"))
    assert(!Robots.allowed(r, "GraftBot/2.1", "/long"))
    assert(Robots.allowed(r, "GraftBot/2.1", "/other"))
    // an unrelated agent falls to *
    assert(!Robots.allowed(r, "elsebot", "/anything"))
  }

  test("rule precedence: longest pattern wins; equal length ties " +
      "go to allow; empty disallow allows all") {
    val r = parse(
      """User-agent: *
        |Disallow: /p/
        |Allow: /p/ok
        |""".stripMargin)
    assert(!Robots.allowed(r, "x", "/p/no"))
    assert(Robots.allowed(r, "x", "/p/okay"))
    val tie = parse("User-agent: *\nDisallow: /a\nAllow: /a\n")
    assert(Robots.allowed(tie, "x", "/a/page"))
    val empty = parse("User-agent: *\nDisallow:\n")
    assert(Robots.allowed(empty, "x", "/anything"))
  }

  test("wildcards and the $ anchor") {
    assert(Robots.pathMatches("/*.pdf$", "/files/doc.pdf"))
    assert(!Robots.pathMatches("/*.pdf$", "/files/doc.pdfx"))
    assert(Robots.pathMatches("/*.pdf", "/files/doc.pdfx"))
    assert(Robots.pathMatches("/a*b*c", "/aXXbYYc-and-more"))
    assert(!Robots.pathMatches("/a*b*c", "/aXXbYY"))
    assert(Robots.pathMatches("/exact$", "/exact"))
    assert(!Robots.pathMatches("/exact$", "/exactly"))
    assert(Robots.pathMatches("/", "/anything"))
    assert(Robots.pathMatches("*", "/anything"))
  }

  test("crawl-delay millis, sitemaps, comments, CRLF, case noise") {
    val r = parse("# hi\r\nUSER-AGENT: GraftBot # inline\r\n" +
      "Crawl-Delay: 2.5\r\nDisallow: /x\r\n\r\n" +
      "Sitemap: https://e.org/a.xml\r\nSitemap: https://e.org/b.xml\r\n")
    assert(Robots.crawlDelayMillis(r, "graftbot").contains(2500L))
    assert(r.sitemaps == Seq("https://e.org/a.xml",
      "https://e.org/b.xml"))
    assert(!Robots.allowed(r, "graftbot", "/x"))
  }

  test("junk parses to crawl-by-default; null/oversized refuse") {
    val junk = parse("random text\nno colons here\n:::\n")
    assert(junk.groups.isEmpty)
    assert(Robots.allowed(junk, "any", "/path"))
    // rules before any group are ignored
    val pre = parse("Disallow: /\nUser-agent: *\nAllow: /a\n")
    assert(pre.groups.length == 1 &&
      pre.groups(0).rules == Seq(Robots.Rule(true, "/a")))
    assert(Robots.parse(null).isEmpty)
    assert(Robots.parse(new Array[Byte](2 << 20)).isEmpty)
    // BOM tolerated
    val bom = Robots.parse(Array[Byte](-17, -69, -65) ++
      "User-agent: *\nDisallow: /\n".getBytes("UTF-8")).get
    assert(!Robots.allowed(bom, "x", "/a"))
  }

  test("fixture decisions match the closed forms for all modes") {
    for (m <- 0 to 2; seed <- Seq(0L, 3L, 41L)) {
      val got = Robots.decodeRobots(Robots.robotsWrite(seed, m))
      assert(got == Seq[Any](2, 4, (seed % 7 + 1) * 1000L,
        s"https://example.org/sm$seed.xml",
        false, true, false, true, true, false), s"m=$m seed=$seed")
    }
  }
}
