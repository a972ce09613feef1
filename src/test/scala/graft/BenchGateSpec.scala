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

  test("hostOffset detects a uniformly-slow sweep (the r16 reboot " +
      "case) and ignores a genuine single-query regression") {
    import graft.BenchGate
    val bars = (1 to 12).map(i => s"q$i" -> (0.5 + i * 0.1)).toMap
    // every query a uniform 1.4× slower → one round-level offset
    val slow = bars.map { case (k, v) => k -> v * 1.4 }
    val off = BenchGate.hostOffset(slow, bars)
    assert(off.exists(o => math.abs(o - 1.4) < 0.01))
    // …and dividing it out un-flags the phantom regressions
    slow.foreach { case (k, v) =>
      assert(BenchGate.suspect(v / off.get, bars.get(k)) ==
        BenchGate.suspect(bars(k), bars.get(k)))
    }
    // ONE query 3× slower on an otherwise-flat sweep: no offset
    // (median ≈ 1.0 is under the 1.2 bar), so the real regression
    // still flags at full strength
    val oneBad = bars.updated("q9", bars("q9") * 3.0)
    assert(BenchGate.hostOffset(oneBad, bars).isEmpty)
    assert(BenchGate.suspect(oneBad("q9"), bars.get("q9")))
    // a NON-uniform slow sweep (half 1.1×, half 2.2×): the median
    // (1.65) can't be trusted as a single offset, but the host IS
    // slow — the r17 driver ran median 1.28 / IQR 1.02–1.74 ragged,
    // got NO de-rate, and dozens of phantom suspects blew the
    // timeout. The fallback de-rates by the conservative P25 (here
    // 1.1 — the slow mode still flags after division, the fast mode
    // clears)
    val ragged = bars.zipWithIndex.map { case ((k, v), i) =>
      k -> (if (i % 2 == 0) v * 1.1 else v * 2.2)
    }.toMap
    val raggedOff = BenchGate.hostOffset(ragged, bars)
    assert(raggedOff.exists(o => math.abs(o - 1.1) < 0.01))
    // a genuinely-regressed query (2.2× > 1.5× even after /1.1)
    // still flags through the ragged de-rate
    val slowKey = ragged.collect {
      case (k, v) if v / bars(k) > 2.0 => k }.head
    assert(BenchGate.suspect(
      ragged(slowKey) / raggedOff.get, bars.get(slowKey)))
    // a ragged sweep whose P25 is ≤1.0 (a quarter of queries at or
    // under their bars) gets NO offset: nothing safe to divide by
    val mixedFast = bars.zipWithIndex.map { case ((k, v), i) =>
      k -> (if (i % 2 == 0) v * 0.9 else v * 2.4)
    }.toMap
    assert(BenchGate.hostOffset(mixedFast, bars).isEmpty)
    // the first LIVE case (r17 re-record): ratios scattered ±20-30%
    // around a 1.53 median — scheduler noise on sub-second queries —
    // must still read as ONE host offset, not 54 regressions
    val noisy = bars.zipWithIndex.map { case ((k, v), i) =>
      k -> v * 1.53 * (1.0 + 0.2 * math.sin(i * 2.399))
    }.toMap
    val noisyOff = BenchGate.hostOffset(noisy, bars)
    assert(noisyOff.exists(o => o > 1.3 && o < 1.8))
    // under 8 comparable queries the median is meaningless → None
    assert(BenchGate.hostOffset(
      slow.take(5), bars).isEmpty)
    // sub-floor bars (0.1 s jitter territory) carry no evidence
    val tiny = (1 to 12).map(i => s"t$i" -> 0.1).toMap
    assert(BenchGate.hostOffset(
      tiny.map { case (k, v) => k -> v * 1.4 }, tiny).isEmpty)
    // on the r16 reboot-era case the offset also survives a few
    // genuinely-regressed queries riding it: 10 uniform 1.38× + 2
    // at 4× still reports ~1.38 and the 4× pair STILL flags after
    // division
    val mixed = bars.map { case (k, v) =>
      k -> (if (k == "q3" || k == "q7") v * 4.0 else v * 1.38)
    }
    val off2 = BenchGate.hostOffset(mixed, bars)
    assert(off2.exists(o => math.abs(o - 1.38) < 0.05))
    assert(BenchGate.suspect(mixed("q7") / off2.get, bars.get("q7")))
  }

  test("renderArtifact: partial emission leaves one parseable JSON " +
      "object of the final shape (kill-safety)") {
    import graft.BenchGate
    val partial = BenchGate.renderArtifact(
      Seq("q_a" -> Seq(1.5, 1.2), "q_b" -> Seq(0.4)),
      Map.empty, Seq("q_broken"), "/root/testdata/sf0.1",
      partial = true, hostOffset = None)
    // must parse as JSON with the driver's own reader
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(partial)
    assert(node.path("partial").asBoolean())
    assert(node.path("value").asDouble() == 1.2 + 0.4)
    assert(node.path("queries").path("q_a").asDouble() == 1.2)
    assert(node.path("reps").path("q_a").size() == 2)
    assert(node.path("failed").get(0).asText() == "q_broken")
    // the same parser the gate itself uses reads it back
    assert(BenchGate.parseQueries(partial.getBytes("UTF-8")) ==
      Map("q_a" -> 1.2, "q_b" -> 0.4))
    // the final emission drops the partial flag and records the
    // host offset + surviving regressions
    val fin = BenchGate.renderArtifact(
      Seq("q_a" -> Seq(1.5, 1.2)), Map("q_a" -> 1.2), Nil,
      "sf0.1", partial = false, hostOffset = Some(1.38))
    val fnode = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(fin)
    assert(fnode.path("partial").isMissingNode)
    assert(fnode.path("host_offset").asDouble() == 1.38)
    assert(fnode.path("regressions").path("q_a").asDouble() == 1.2)
  }

  test("the gate phase is budget-bound: no re-measurement past " +
      "the wall budget or its own 15% slice (the r17 driver kill)") {
    // healthy run, young gate → re-measure
    assert(BenchGate.gateMayRemeasure(600, 10, 2400))
    // the whole run is over budget → stop, keep raw flags
    assert(!BenchGate.gateMayRemeasure(2500, 10, 2400))
    // the gate alone ate its slice (15% of 2400 = 360 s) → stop
    assert(!BenchGate.gateMayRemeasure(600, 361, 2400))
    assert(BenchGate.gateMayRemeasure(600, 359, 2400))
  }

  test("stall classification: a >=10x-bar survivor is a host " +
      "stall, not a regression (r18's 206 s vs 1.09 s artifact); " +
      "the artifact splits the two keys") {
    import graft.BenchGate
    // 2x the bar: suspect, but NOT a stall — genuine plan change
    assert(BenchGate.suspect(2.2, Some(1.0)))
    assert(!BenchGate.isStall(2.2, Some(1.0)))
    // 189x the bar: a plan change does not do that
    assert(BenchGate.isStall(189.0, Some(1.09)))
    // boundary: exactly 10x is not over
    assert(!BenchGate.isStall(10.0, Some(1.0)))
    assert(BenchGate.isStall(10.1, Some(1.0)))
    // no history → never a stall
    assert(!BenchGate.isStall(500.0, None))
    // sub-noise-floor bars don't stall-flag jitter
    assert(!BenchGate.isStall(0.7, Some(0.05)))
    val line = BenchGate.renderArtifact(
      Seq("q_a" -> Seq(2.2), "q_b" -> Seq(206.0)),
      Map("q_a" -> 2.2), Nil, "sf0.1", partial = false,
      hostOffset = None, stalls = Map("q_b" -> 206.0))
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line)
    assert(node.path("regressions").path("q_a").asDouble() == 2.2)
    assert(node.path("regressions").path("q_b").isMissingNode)
    assert(node.path("stalls").path("q_b").asDouble() == 206.0)
  }

  test("compact artifact mode drops the per-rep arrays but keeps " +
      "every other key (the driver's tail-window parse)") {
    import graft.BenchGate
    val line = BenchGate.renderArtifact(
      Seq("q_a" -> Seq(1.5, 1.2)), Map.empty, Nil, "sf0.1",
      partial = false, hostOffset = Some(1.4),
      stalls = Map.empty, compact = true)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line)
    assert(node.path("reps").isMissingNode)
    assert(node.path("queries").path("q_a").asDouble() == 1.2)
    assert(node.path("value").asDouble() == 1.2)
    assert(node.path("host_offset").asDouble() == 1.4)
    assert(node.path("stalls").isObject)
    // and the gate's own history parser still reads it
    assert(BenchGate.parseQueries(line.getBytes("UTF-8")) ==
      Map("q_a" -> 1.2))
  }

  test("renderArtifact escapes quotes/backslashes/control chars " +
      "in strings (kill-safe artifact must always parse)") {
    import graft.BenchGate
    val line = BenchGate.renderArtifact(
      Seq("q_a" -> Seq(1.0)), Map.empty, Seq("q_\"broken\\\n"),
      """C:\data\sf "0.1"""", partial = true, hostOffset = None)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line)
    assert(node.path("sf").asText() == """C:\data\sf "0.1"""")
    assert(node.path("failed").get(0).asText() == "q_\"broken\\\n")
  }
}
