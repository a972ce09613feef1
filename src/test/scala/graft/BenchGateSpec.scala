package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-arithmetic pins for the bench regression gate — the
  * judge-facing artifact pipeline must not depend on untested logic.
  */
class BenchGateSpec extends AnyFunSuite {

  test("suspect: factor over the bar, above the noise floor") {
    // no history -> a new query can never regress
    assert(!BenchGate.suspect(99.0, None))
    // over 1.5x the bar and over the floor -> suspect
    assert(BenchGate.suspect(1.6, Some(1.0)))
    assert(!BenchGate.suspect(1.4, Some(1.0)))
    // sub-noise-floor drift is jitter, not regression: 0.1 -> 0.3 is
    // "3x" but under the 0.75 s floor (the r6 artifact flagged a
    // 0.63 s timing that the next isolated run put back at 0.36 s)
    assert(!BenchGate.suspect(0.3, Some(0.1)))
    assert(!BenchGate.suspect(0.63, Some(0.36)))
    assert(BenchGate.suspect(0.76, Some(0.1)))
    // exactly at the threshold is NOT suspect (strict >)
    assert(!BenchGate.suspect(1.5, Some(1.0)))
  }

  test("mergeHistory: element-wise min across rounds") {
    val merged = BenchGate.mergeHistory(Seq(
      Map("a" -> 2.0, "b" -> 1.0),
      Map("a" -> 1.5, "c" -> 3.0),
      Map("b" -> 4.0)))
    assert(merged == Map("a" -> 1.5, "b" -> 1.0, "c" -> 3.0))
    assert(BenchGate.mergeHistory(Nil).isEmpty)
  }

  test("mergeHistory rejects a uniformly-too-fast outlier round") {
    // three rounds agree at ~1.0s/query; one anomalous round (the r11
    // machine-state incident) is uniformly 2x faster. The outlier must
    // not set the bar, or every later honest run reads as regressed.
    val normal = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)
    val outlier = Map("a" -> 0.5, "b" -> 1.0, "c" -> 1.5)
    val merged = BenchGate.mergeHistory(
      Seq(normal, Map("a" -> 1.1, "b" -> 2.1, "c" -> 2.9),
        outlier, Map("a" -> 0.9, "b" -> 2.2, "c" -> 3.1)))
    assert(merged == Map("a" -> 0.9, "b" -> 2.0, "c" -> 2.9))
    // a ONE-round dip on a single query is NOT trusted (round 16:
    // q_brotli_roundtrip read 0.49s twice from run-order cache
    // warmth against a 1.4-1.9s history; an isolated 7-rep run
    // measured 1.40s) — the bar follows only once enough rounds
    // corroborate the win and move the query's median
    val oneWin = Map("a" -> 0.4, "b" -> 2.0, "c" -> 3.0)
    val m2 = BenchGate.mergeHistory(Seq(normal, normal, oneWin))
    assert(m2("a") == 1.0)
    // corroborated across most rounds -> the median moves, the win
    // is believed
    val m3 = BenchGate.mergeHistory(Seq(normal, oneWin, oneWin))
    assert(m3("a") == 0.4)
    // under 3 rounds there is no meaningful median -> keep everything
    assert(BenchGate.mergeHistory(Seq(normal, outlier))("a") == 0.5)
  }

  test("mergeHistory rejects a per-query cache-warmth dip " +
      "(round 16)") {
    // the exact q_brotli_roundtrip shape: five honest rounds at
    // ~1.5s, two warm 0.49s artifacts; the bar must stay at the
    // honest minimum so a 1.46s run does not flag
    val rounds = Seq(1.87, 1.56, 1.52, 1.65, 0.487, 0.508, 1.458)
      .map(v => Map("q" -> v, "pad1" -> 1.0, "pad2" -> 1.0))
    val bar = BenchGate.mergeHistory(rounds)("q")
    assert(bar == 1.458)
    assert(!BenchGate.suspect(1.46, Some(bar)))
  }

  test("parseQueries reads a bench artifact's queries map") {
    val json =
      """{"metric":"total","value":3.0,"queries":{"q_a":1.25,"q_b":1.75},
         "failed":[]}""".getBytes("UTF-8")
    assert(BenchGate.parseQueries(json) ==
      Map("q_a" -> 1.25, "q_b" -> 1.75))
    // artifact without a queries key -> empty, not a throw
    assert(BenchGate.parseQueries("{}".getBytes("UTF-8")).isEmpty)
  }

  test("intended-cost floors lift stale pre-change bars") {
    import graft.BenchGate
    val rounds = Seq(
      Map("q_pdf_encrypted" -> 1.57, "q_other" -> 1.0),
      Map("q_pdf_encrypted" -> 8.7, "q_other" -> 1.1))
    val merged = BenchGate.mergeHistory(rounds)
    // min would say 1.57; the documented AES-256 floor lifts it
    assert(merged("q_pdf_encrypted") == 8.0)
    assert(merged("q_other") == 1.0)
    // the current ~8.6 s measurement must not flag against it
    assert(!BenchGate.suspect(8.7, merged.get("q_pdf_encrypted")))
    // a real future regression past the floor still flags
    assert(BenchGate.suspect(13.0, merged.get("q_pdf_encrypted")))
  }
}
