package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Feed

/** RSS/Atom feed extraction: dialect detection, namespace prefixes,
  * the image/source title traps, CDATA bodies, refusals.
  */
class FeedSpec extends AnyFunSuite {

  private val items = Seq(("First post", "body one"),
    ("Second", "body & <two>"))

  test("rss 2.0 with escaped bodies round-trips") {
    val doc = Feed.feedText(Feed.feedWrite("My Blog", items, 0)).get
    assert(doc.kind == "rss")
    assert(doc.title == "My Blog")
    assert(doc.text ==
      "First post\nbody one\nSecond\nbody & <two>")
    assert(doc.nItems == 2)
  }

  test("rss with CDATA bodies and decoy image title") {
    val doc = Feed.feedText(Feed.feedWrite("T", items, 1)).get
    assert(doc.title == "T")
    assert(!doc.title.contains("decoy"))
    assert(doc.text.contains("body & <two>"))
    assert(!doc.text.contains("decoy"))
  }

  test("atom under a namespace prefix with source-title trap") {
    val doc = Feed.feedText(Feed.feedWrite("Ω feed", items, 2)).get
    assert(doc.kind == "atom")
    assert(doc.title == "Ω feed")
    assert(doc.text ==
      "First post\nbody one\nSecond\nbody & <two>")
    assert(!doc.text.contains("decoy source title"))
  }

  test("a literal ]]> in a CDATA body survives the split rule") {
    val tricky = Seq(("t", "a ]]> b"))
    val doc = Feed.feedText(Feed.feedWrite("x", tricky, 1)).get
    assert(doc.text == "t\na ]]> b")
  }

  test("title-only items carry no separator") {
    val doc = Feed.feedText(
      Feed.feedWrite("x", Seq(("only title", "")), 0)).get
    assert(doc.text == "only title")
    assert(doc.nItems == 1)
  }

  test("refusals: not xml, not a feed root, malformed markup") {
    assert(Feed.feedText(null).isEmpty)
    assert(Feed.feedText("plain text".getBytes).isEmpty)
    assert(Feed.feedText("<html><body>no</body></html>".getBytes)
      .isEmpty)
    assert(Feed.feedText(
      "<rss><channel><item>unclosed".getBytes).isEmpty)
  }

  test("decoder is total under mutation") {
    for (m <- 0 to 2) {
      val base = Feed.feedWrite("mut é→Ω", items, m)
      val rnd = new scala.util.Random(99 + m)
      for (_ <- 0 until 200) {
        val b = base.clone()
        for (_ <- 0 until 1 + rnd.nextInt(4))
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        Feed.feedText(b) // must not throw
      }
    }
  }
}
