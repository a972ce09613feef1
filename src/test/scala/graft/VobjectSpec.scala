package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vobject

/** iCalendar + vCard extraction: unfolding (including folds inside
  * escape sequences), TEXT unescape, exact event durations, VALARM
  * exclusion, vCard 2.1 quoted-printable, refusals.
  */
class VobjectSpec extends AnyFunSuite {

  test("ics round-trips summary/description with exact duration") {
    val doc = Vobject.icsText(Vobject.icsWrite(
      "Standup", "notes; with, escapes\\and\nnewlines", 13L, 0)).get
    assert(doc.nEvents == 2)
    assert(doc.text == "Standup\nnotes; with, escapes\\and\nnewlines" +
      "\nclosing event " + (13L % 9))
    assert(doc.durationS == 2 * (1800 + (13 % 11) * 60))
  }

  test("aggressive folding (mode 1) splits escapes and still parses") {
    val long = ("prose, with; escapes\\ " * 12).trim
    val doc = Vobject.icsText(Vobject.icsWrite(
      "s" * 100, long, 5L, 1)).get
    assert(doc.text.startsWith("s" * 100))
    assert(doc.text.contains(long))
  }

  test("VALARM text and parameterized SUMMARY (mode 2)") {
    val doc = Vobject.icsText(Vobject.icsWrite(
      "param summary", "body", 2L, 2)).get
    assert(doc.text.startsWith("param summary\nbody"))
    assert(!doc.text.contains("decoy alarm"))
  }

  test("zoned and date-only DTSTART contribute zero, never a guess") {
    val ics = """BEGIN:VCALENDAR
BEGIN:VEVENT
DTSTART;TZID=America/New_York:20260815T120000
DTEND;TZID=America/New_York:20260815T130000
SUMMARY:zoned
END:VEVENT
END:VCALENDAR
""".replace("\n", "\r\n")
    val doc = Vobject.icsText(ics.getBytes("UTF-8")).get
    assert(doc.durationS == 0L)
    assert(doc.text == "zoned")
  }

  test("ics refusals: unbalanced components, wrong root, no colon") {
    assert(Vobject.icsText(null).isEmpty)
    assert(Vobject.icsText("not ics".getBytes).isEmpty)
    assert(Vobject.icsText(
      "BEGIN:VEVENT\r\nEND:VEVENT\r\n".getBytes).isEmpty)
    assert(Vobject.icsText(
      "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nEND:VCALENDAR\r\n"
        .getBytes).isEmpty)
    assert(Vobject.icsText(
      "BEGIN:VCALENDAR\r\nbroken line\r\nEND:VCALENDAR\r\n"
        .getBytes).isEmpty)
  }

  test("vcf round-trips plain, folded, and 2.1 quoted-printable") {
    for (m <- 0 to 2) {
      val doc = Vobject.vcfText(Vobject.vcfWrite(
        "Ada Lovelace Ω", "Analytical; Engines, Ltd", m)).get
      assert(doc.nCards == 1, s"mode $m")
      assert(doc.text ==
        "Ada Lovelace Ω\nAnalytical; Engines, Ltd\n" +
          "card@example.test", s"mode $m")
    }
  }

  test("multiple concatenated cards") {
    val two = Vobject.vcfWrite("A", "O1", 0) ++
      Vobject.vcfWrite("B", "O2", 0)
    val doc = Vobject.vcfText(two).get
    assert(doc.nCards == 2)
    assert(doc.text ==
      "A\nO1\ncard@example.test\nB\nO2\ncard@example.test")
  }

  test("vcf refusals: nesting, missing wrapper, dangling escape") {
    assert(Vobject.vcfText("FN:loose\r\n".getBytes).isEmpty)
    assert(Vobject.vcfText(
      "BEGIN:VCARD\r\nBEGIN:VCARD\r\n".getBytes).isEmpty)
    assert(Vobject.vcfText(
      "BEGIN:VCARD\r\nFN:bad\\\r\nEND:VCARD\r\n".getBytes).isEmpty)
  }

  test("quoted parameter values hide colons and semicolons") {
    val ics = ("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n" +
      "SUMMARY;X-A=\"x:y;z\":real value\r\n" +
      "END:VEVENT\r\nEND:VCALENDAR\r\n").getBytes("UTF-8")
    assert(Vobject.icsText(ics).get.text == "real value")
  }

  test("decoders are total under mutation") {
    val ics = Vobject.icsWrite("mut é→Ω", "desc é→Ω", 7L, 2)
    val vcf = Vobject.vcfWrite("mut é→Ω", "org", 2)
    val rnd = new scala.util.Random(4321)
    for (_ <- 0 until 300) {
      val a = ics.clone(); val b = vcf.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4)) {
        a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Vobject.icsText(a); Vobject.vcfText(b) // must not throw
    }
  }
}
