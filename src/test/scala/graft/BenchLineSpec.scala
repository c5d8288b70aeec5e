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
    // 7 fork groups. The line may step down the integer-unit ladder
    // when the float-seconds rung cannot fit, but the contention
    // block must survive the step-down (the r12 lesson: the driver
    // run WAS contended and the line carried no evidence).
    val results = gateNames.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 4 == 0) 4.321 else 0.543)
    }
    val forks = Seq.fill(7)((24, 1, false))
    val line = Bench.compactLine(results, 6.15, 1.97, 5, 24, forks, "/root/testdata/sf0.1")
    assert(line.length < 2000, s"driver line too long: ${line.length} chars")
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"queries\":{"))
    assert(line.contains("\"contention\":{\"load\":[6.15,1.97]"), line.take(200))
    // every gate key present, whatever the unit
    val short = Bench.shortNames(gateNames)
    assert(gateNames.forall(n => line.contains("\"" + short(n) + "\":")))
    // it is one valid JSON object (cheap structural check: balanced
    // braces, single line)
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("every ladder rung retains the contention block; detail degrades first") {
    // the r12 what's-wrong: the ladder dropped contention before
    // per-query detail, and the one contended driver run of the round
    // shipped no evidence to adjudicate its ten ≥1.5× artifacts. Walk
    // suite sizes from moderate to past-the-envelope: whatever rung
    // renders, the contention block must be on it (the contention-less
    // terminal backstop is reachable only via a pathological
    // forks-triple list, exercised separately below).
    for (n <- Seq(60, 120, 180, gateNames.size)) {
      val results = gateNames.take(n).map(m => m -> 99.123)
      val line = Bench.compactLine(results, 3.78, 2.12, 5, 24,
        Seq.fill(7)((24, 1, false)), "sf0.1")
      assert(line.length < 2000, s"n=$n line too long: ${line.length}")
      assert(line.contains("\"contention\":{\"load\":[3.78,2.12]"),
        s"n=$n rung dropped contention: ${line.take(160)}")
    }
  }

  test("pathological digit inflation self-downgrades the unit rather than overflow the window") {
    // every gate at 99 s adds a digit per entry; the line first
    // switches q_unit (ms -> cs/ds/s), and beyond ~210 gates — where
    // even integer seconds cannot fit — it drops the map and says so
    // (q_dropped) rather than emit a line the capture would truncate
    // into invalid JSON (the BENCH_r07 failure mode). The total AND
    // the contention block must survive either way; per-query timings
    // live in BENCH_SELF.
    val results = gateNames.map(n => n -> 99.123)
    val line = Bench.compactLine(results, 0, 0, 5, 24, Seq.fill(7)((24, 1, false)), "sf0.1")
    assert(line.length < 2000, s"driver line too long: ${line.length} chars")
    assert(line.contains("\"value\":"))
    assert(line.contains("\"contention\":{"), line.take(160))
    if (line.contains("\"queries\":{")) {
      assert("\"q_unit\":\"(cs|ds|s)\"".r.findFirstIn(line).nonEmpty, line.take(120))
      assert(gateNames.forall(n => line.contains("\"" + Bench.shortNames(gateNames)(n) + "\":")),
        "every gate key present")
    } else {
      assert(line.contains(s""""q_dropped":${gateNames.size}"""), line)
    }
    assert(line.sliding(5).count(_ == "\":-1,") == 0)
  }

  test("a pathological forks-triple list falls to the bounded contention-less backstop") {
    // hundreds of retried fork groups inflate the contention block
    // itself past the budget; the terminal rung drops it rather than
    // emit a truncatable line, and stays inside the same budget check
    // (the ADVICE r12 low: no unchecked getOrElse escape)
    val results = gateNames.map(n => n -> 99.123)
    val manyRetries = Seq.fill(400)((1, 2, true))
    val line = Bench.compactLine(results, 9.99, 9.99, 5, 1, manyRetries, "sf0.1")
    assert(line.length < 2000, s"driver line too long: ${line.length} chars")
    assert(line.contains(s""""q_dropped":${gateNames.size}"""), line.take(200))
  }

  test("BENCH_SELF provenance is machine-readable: git sha (+dirty marker) and gate count") {
    // the round-14 nit: capture provenance was maintained by COVERAGE
    // prose; now the artifact carries it itself. `unknown` is allowed
    // only for environments without git — never silently malformed.
    val sha = Bench.gitSha()
    assert(sha.matches("[0-9a-f]{40}(-dirty)?") || sha == "unknown", sha)
    val frag = Bench.provenanceJson(221)
    assert(frag.matches(""""git_sha":"[^"]+","gates":221"""), frag)
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
      // the contention load array legitimately separates two
      // DOT-decimal floats with a comma — scrub that exact shape
      // first; a locale leak renders '1,50' inside it and survives
      val scrubbed = line.replaceAll("\\[\\d+\\.\\d+,\\d+\\.\\d+\\]", "[]")
      assert(!scrubbed.matches("(?s).*\\d,\\d.*"), s"comma decimal leaked: $line")
    } finally java.util.Locale.setDefault(prev)
  }
}
