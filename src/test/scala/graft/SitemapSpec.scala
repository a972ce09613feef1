package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sitemap

/** Sitemap XML: urlset/sitemapindex parsing with exact epoch-day
  * lastmod and milli priority, namespace/CDATA layouts, refusals.
  */
class SitemapSpec extends AnyFunSuite {

  test("urlset round-trips through plain and prefixed layouts") {
    for (m <- 0 to 1; seed <- Seq(0L, 7L, 123L)) {
      val d = Sitemap.parse(Sitemap.sitemapWrite(seed, 4, m)).get
      assert(d.kind == "urlset" && d.entries.length == 4, s"m=$m")
      val e0 = d.entries.head
      assert(e0.loc == s"https://example.org/p${seed}_0")
      assert(e0.lastmodDay == 18262L + seed % 1000)
      assert(e0.changefreq ==
        (if (seed % 2 == 0) "daily" else "weekly"))
      assert(e0.priorityMilli == (seed % 10) * 100)
    }
  }

  test("sitemapindex parses child references with dates") {
    val d = Sitemap.parse(Sitemap.sitemapWrite(5L, 3, 2)).get
    assert(d.kind == "sitemapindex" && d.entries.length == 3)
    assert(d.entries(1).loc == "https://example.org/sm5_1.xml")
    assert(d.entries(1).lastmodDay == 18262L + 6)
    assert(d.entries(1).priorityMilli == -1L) // absent
  }

  test("priorityMilli: exact forms and refusals") {
    assert(Sitemap.priorityMilli("0.8") == 800)
    assert(Sitemap.priorityMilli("1") == 1000)
    assert(Sitemap.priorityMilli("1.0") == 1000)
    assert(Sitemap.priorityMilli("0.55") == 550)
    assert(Sitemap.priorityMilli("0.1239") == 123) // truncation
    assert(Sitemap.priorityMilli("0") == 0)
    for (bad <- Seq("1.1", "2", "-0.5", "", "high", "0.5e1"))
      intercept[RuntimeException](Sitemap.priorityMilli(bad))
  }

  test("lastmod accepts full W3C datetimes; the DATE part is exact") {
    val xml = ("<urlset><url><loc>https://e.org/x</loc>" +
      "<lastmod>2021-03-14T09:26:53+01:00</lastmod></url>" +
      "</urlset>").getBytes("UTF-8")
    val d = Sitemap.parse(xml).get
    assert(d.entries.head.lastmodDay ==
      java.time.LocalDate.of(2021, 3, 14).toEpochDay)
  }

  test("foreign roots and torn xml refuse; bad dates/priorities " +
      "null just their field (ADVICE r14)") {
    assert(Sitemap.parse(null).isEmpty)
    assert(Sitemap.parse("<rss><channel/></rss>".getBytes).isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>x".getBytes).isEmpty)
    // one bad <lastmod>/<priority> must not refuse the whole doc —
    // the entry survives with that field absent
    val badDate = Sitemap.parse(("<urlset><url><loc>u</loc>" +
      "<lastmod>not-a-date</lastmod></url></urlset>").getBytes).get
    assert(badDate.entries.map(e => (e.loc, e.lastmodDay)) ==
      Seq(("u", -1L)))
    val badPri = Sitemap.parse(("<urlset><url><loc>u</loc>" +
      "<priority>9.9</priority></url></urlset>").getBytes).get
    assert(badPri.entries.map(e => (e.loc, e.priorityMilli)) ==
      Seq(("u", -1L)))
    // a good sibling field on the same entry still parses
    val mixed = Sitemap.parse(("<urlset><url><loc>u</loc>" +
      "<lastmod>bogus</lastmod><priority>0.4</priority></url>" +
      "</urlset>").getBytes).get
    assert(mixed.entries.head.priorityMilli == 400L)
    assert(mixed.entries.head.lastmodDay == -1L)
    // entries without a loc are skipped, not fatal
    val d = Sitemap.parse(("<urlset><url><changefreq>daily" +
      "</changefreq></url><url><loc>kept</loc></url></urlset>")
      .getBytes).get
    assert(d.entries.map(_.loc) == Seq("kept"))
  }
}
