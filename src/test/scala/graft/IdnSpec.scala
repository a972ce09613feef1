package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Idn

/** RFC 3492 bootstring pinned against the JDK's IDN implementation
  * (an independent reference) over generated label families, plus
  * hand goldens and refusals.
  */
class IdnSpec extends AnyFunSuite {

  test("hand goldens decode and encode (well-known IDN labels)") {
    // bücher ↔ bcher-kva; the famous Egyptian TLD; Japanese
    assert(Idn.punyDecode("bcher-kva").contains("bücher"))
    assert(Idn.punyEncode("bücher").contains("bcher-kva"))
    assert(Idn.hostToAscii("bücher.example")
      .contains("xn--bcher-kva.example"))
    assert(Idn.hostToUnicode("xn--bcher-kva.example")
      .contains("bücher.example"))
    // all-ASCII passes through lowercased
    assert(Idn.hostToAscii("WWW.Example.COM")
      .contains("www.example.com"))
    assert(Idn.hostToUnicode("www.example.com")
      .contains("www.example.com"))
  }

  test("both directions agree with the JDK reference over label " +
      "families") {
    val labels = Seq("bücher", "müller", "ärger", "例え", "テスト",
      "пример", "δοκιμή", "מבחן", "परीक्षा", "试验", "tübingen",
      "königsberg", "café", "ño1", "a例b試c",
      "mixed例ascii", "漢字とかな")
    for (l <- labels) {
      val jdk = java.net.IDN.toASCII(l)
      val ours = Idn.hostToAscii(l)
      assert(ours.contains(jdk.toLowerCase(java.util.Locale.ROOT)),
        s"encode $l: ours=$ours jdk=$jdk")
      assert(Idn.hostToUnicode(jdk).contains(l), s"decode $l")
    }
    // multi-label hosts
    for (h <- Seq("bücher7.ärger3.例え.org", "пример.テスト.net")) {
      val jdk = java.net.IDN.toASCII(h)
      assert(Idn.hostToAscii(h).contains(jdk))
      assert(Idn.hostToUnicode(jdk).contains(h))
    }
  }

  test("generated-label property: encode matches the JDK and " +
      "decodes back") {
    val rnd = new scala.util.Random(42)
    val pools = Array(
      ('a' to 'z').mkString,
      "äöüéèêñç", // no ß: IDNA2003 nameprep maps it to "ss",
      // outside this module's documented bootstring-only scope
      "αβγδε",
      "абвгд",
      "一二三四五")
    var checked = 0
    for (_ <- 0 until 400) {
      val len = 1 + rnd.nextInt(12)
      val label = (0 until len).map { _ =>
        val p = pools(rnd.nextInt(pools.length))
        p.charAt(rnd.nextInt(p.length))
      }.mkString
      // the JDK refuses some shapes (length, hyphens); compare only
      // where the reference itself accepts
      val jdk = try Some(java.net.IDN.toASCII(label))
        catch { case _: Exception => None }
      jdk.foreach { j =>
        assert(Idn.hostToAscii(label)
          .contains(j.toLowerCase(java.util.Locale.ROOT)),
          s"label $label")
        assert(Idn.hostToUnicode(j).contains(label), s"label $label")
        checked += 1
      }
    }
    assert(checked > 300, s"only $checked labels were comparable")
  }

  test("malformed ACE refuses; never throws") {
    assert(Idn.punyDecode(null).isEmpty)
    assert(Idn.punyDecode("!!!").isEmpty)
    assert(Idn.punyDecode("-").contains("")) // empty decode
    assert(Idn.hostToUnicode("xn--!!!.org").isEmpty)
    assert(Idn.hostToUnicode("").isEmpty)
    assert(Idn.hostToAscii(null).isEmpty)
    // overflow-shaped inputs classify, never crash
    for (s <- Seq("99999999", "zzzzzzzzzz9", "a-zzzzzzzzz",
      "xn--", "0--0"))
      Idn.punyDecode(s)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val len = 1 + rnd.nextInt(20)
      val s = (0 until len).map(_ =>
        (33 + rnd.nextInt(90)).toChar).mkString
      Idn.punyDecode(s) // total
      Idn.punyEncode(s)
    }
  }
}
