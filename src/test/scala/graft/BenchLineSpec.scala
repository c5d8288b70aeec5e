package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's log capture keeps only the last ~2000 chars of the
  * bench output; BENCH_r07 truncated the full-name line at 44 of 160
  * queries (`parsed: null`). These tests pin the compact driver-facing
  * line's contract: unique short keys, integer-ms values, and a total
  * length that fits the capture window with growth headroom.
  */
class BenchLineSpec extends AnyFunSuite {

  private val gateNames = SparkEntry.queries.keys.toSeq.sorted

  test("short codes are unique across every registered gate") {
    val short = Bench.shortNames(gateNames)
    assert(short.size == gateNames.size)
    assert(short.values.toSet.size == gateNames.size,
      s"colliding short codes: ${short.groupBy(_._2).filter(_._2.size > 1)}")
    // the family code is the round-doc citation id: q_dd10_… → dd10
    assert(short("q_a1_agg_pricing") == "a1")
  }

  test("known collision family disambiguates by initials, not dropped") {
    val short = Bench.shortNames(Seq("q_j6_anti_join", "q_j6_best_per_group"))
    assert(short.values.toSet.size == 2)
    assert(short.values.forall(_.startsWith("j6")))
  }

  test("compact line fits the ~2000-char capture window for a pessimistic full-suite run") {
    // pessimistic shape: EVERY gate present, realistic mixed digits,
    // 7 fork groups. Preference is the driver contract's exact shape
    // (float seconds, no extra fields); the line may step down to the
    // integer-unit ladder only when that cannot fit.
    val results = gateNames.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 4 == 0) 4.321 else 0.543)
    }
    val forks = Seq.fill(7)((24, 1, false))
    val line = Bench.compactLine(results, 6.15, 1.97, 5, 24, forks, "/root/testdata/sf0.1")
    assert(line.length < 2000, s"driver line too long: ${line.length} chars")
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"queries\":{"))
    // every gate key present, whatever the unit
    val short = Bench.shortNames(gateNames)
    assert(gateNames.forall(n => line.contains("\"" + short(n) + "\":")))
    // it is one valid JSON object (cheap structural check: balanced
    // braces, single line)
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("a moderate suite emits the driver contract's exact shape: float seconds, no extras") {
    // 120 gates easily fit the budget — the line must be the contract
    // sample's shape (queries valued in seconds, no q_unit/contention)
    val results = gateNames.take(120).map(n => n -> 0.543)
    val line = Bench.compactLine(results, 0, 0, 5, 24, Seq.fill(5)((24, 1, false)), "sf0.1")
    assert(!line.contains("q_unit"), line.take(160))
    assert(!line.contains("contention"), line.take(160))
    assert(line.contains("\"unit\":\"sec\"") && line.contains(":0.5"), line.take(160))
  }

  test("pathological digit inflation self-downgrades the unit rather than overflow the window") {
    // every gate at 99 s adds a digit per entry; the line first
    // switches q_unit (ms -> cs/ds/s), and beyond ~210 gates — where
    // even integer seconds cannot fit — it drops the map and says so
    // (q_dropped) rather than emit a line the capture would truncate
    // into invalid JSON (the BENCH_r07 failure mode). The total must
    // survive either way; per-query timings live in BENCH_SELF.
    val results = gateNames.map(n => n -> 99.123)
    val line = Bench.compactLine(results, 0, 0, 5, 24, Seq.fill(7)((24, 1, false)), "sf0.1")
    assert(line.length < 2000, s"driver line too long: ${line.length} chars")
    assert(line.contains("\"value\":"))
    if (line.contains("\"queries\":{")) {
      assert("\"q_unit\":\"(cs|ds|s)\"".r.findFirstIn(line).nonEmpty, line.take(120))
      assert(gateNames.forall(n => line.contains("\"" + Bench.shortNames(gateNames)(n) + "\":")),
        "every gate key present")
    } else {
      assert(line.contains(s""""q_dropped":${gateNames.size}"""), line)
    }
    assert(line.sliding(5).count(_ == "\":-1,") == 0)
  }

  test("failed queries record -1; total excludes them") {
    val line = Bench.compactLine(
      Seq("q_a1_agg_pricing" -> 1.0, "q_a2_conditional_agg" -> -1.0),
      0, 0, 5, 24, Nil, "sf")
    assert(line.contains("\"a1\":1.0"))
    assert(line.contains("\"a2\":-1"))
    assert(line.contains("\"value\":1.0"))
  }

  test("line renders dot-decimal floats under a comma-decimal default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(
        Seq("q_a1_agg_pricing" -> 1.234, "q_j7_cross_join" -> 0.05),
        1.5, 0.7, 1, 24, Seq((2, 1, false)), "/root/testdata/sf0.1")
      assert(line.contains("\"value\":1.3"), line)
      assert(line.contains("\"a1\":1.2"), line)
      assert(!line.matches("(?s).*\\d,\\d.*"), s"comma decimal leaked: $line")
    } finally java.util.Locale.setDefault(prev)
  }
}
