package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gpx

/** GPX/KML trace extraction: exact micro-degree decimal parsing,
  * point censuses, name routing, refusals.
  */
class GpxSpec extends AnyFunSuite {

  test("microDeg parses exactly, truncates beyond 6 digits") {
    assert(Gpx.microDeg("51.5074", 90000000L) == 51507400L)
    assert(Gpx.microDeg("-0.1278", 180000000L) == -127800L)
    assert(Gpx.microDeg("10", 90000000L) == 10000000L)
    assert(Gpx.microDeg("1.2345678", 90000000L) == 1234567L)
    assert(Gpx.microDeg("+89.999999", 90000000L) == 89999999L)
    intercept[Exception](Gpx.microDeg("91.0", 90000000L))
    intercept[Exception](Gpx.microDeg("1.2e3", 90000000L))
    intercept[Exception](Gpx.microDeg("", 90000000L))
    intercept[Exception](Gpx.microDeg(".", 90000000L))
  }

  test("gpx round-trips name, census, and exact sums") {
    val t = Gpx.gpxTrace(Gpx.gpxWrite("morning run", 7L, 3)).get
    assert(t.name == "morning run")
    assert(t.nPoints == 4) // 3 trkpts + 1 wpt
    // closed form: n*(1e7 + seed%1e6) + 1000 * sum(0..3)
    assert(t.latMicroSum == 4L * (10000000L + 7L) + 1000L * 6)
    assert(t.lonMicroSum == -(4L * (20000000L + 7L) + 1000L * 6))
    assert(t.latMin == 10000007L)
    assert(t.latMax == 10000007L + 3000L)
  }

  test("kml round-trips through coordinates triples") {
    val t = Gpx.kmlTrace(Gpx.kmlWrite("hike & back", 9L, 5)).get
    assert(t.name == "hike & back")
    assert(t.nPoints == 5)
    assert(t.latMicroSum == 5L * (10000000L + 9L) + 1000L * 10)
  }

  test("the metadata name decoy never becomes the track name") {
    val t = Gpx.gpxTrace(Gpx.gpxWrite("real", 1L, 2)).get
    assert(t.name == "real")
    assert(!t.name.contains("decoy"))
  }

  test("refusals: wrong root, malformed coordinate, torn xml") {
    assert(Gpx.gpxTrace(null).isEmpty)
    assert(Gpx.gpxTrace("<kml></kml>".getBytes).isEmpty)
    assert(Gpx.kmlTrace("<gpx></gpx>".getBytes).isEmpty)
    assert(Gpx.gpxTrace(
      "<gpx><trk><trkseg><trkpt lat=\"x\" lon=\"1\"/></trkseg></trk></gpx>"
        .getBytes).isEmpty)
    assert(Gpx.kmlTrace(
      "<kml><Placemark><coordinates>1,2,3 4</coordinates></Placemark></kml>"
        .getBytes).isEmpty) // "4" alone is not a lon,lat pair
    val good = Gpx.gpxWrite("n", 3L, 2)
    assert(Gpx.gpxTrace(java.util.Arrays.copyOf(good, 60)).isEmpty)
  }

  test("decoders are total under mutation") {
    val g = Gpx.gpxWrite("mut é→Ω", 5L, 3)
    val k = Gpx.kmlWrite("mut é→Ω", 5L, 3)
    val rnd = new scala.util.Random(8888)
    for (_ <- 0 until 300) {
      val a = g.clone(); val b = k.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4)) {
        a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Gpx.gpxTrace(a); Gpx.kmlTrace(b) // must not throw
    }
  }
}
