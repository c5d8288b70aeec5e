package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-type lint: DuckDB widens `sum()` over integers to HUGEINT
  * (INT128), which the driver's schema/hash compare cannot match
  * against Spark's BIGINT — the exact failure mode that cost three
  * gates in round 5 (q_cc4 / q_qc1 / q_sp5). Every integer sum that
  * can reach an oracle's output schema must therefore be wrapped
  * `CAST(sum(...) AS BIGINT)`.
  *
  * A `sum(` occurrence is considered safe when:
  *  - it is immediately wrapped by `CAST(` (optionally through
  *    `round(` / `coalesce(` — the decimal-money and window-sum
  *    idioms), or
  *  - its argument is DECIMAL-cast (DuckDB keeps decimal sums
  *    DECIMAL, which the oracles then round/cast on output).
  *
  * Anything else must be pinned in [[allowedBareSums]] with its exact
  * count — these are CTE-internal sums that never reach the output
  * schema (proven by their green driver gates). Pinning the COUNT
  * means adding one more bare sum to an allowlisted oracle still
  * fails the lint and forces a conscious decision.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  private val SumPat = "(?i)(?<![a-z_0-9])sum\\s*\\(".r
  private val CastWrap = "(?i)cast\\s*\\(\\s*(?:(?:round|coalesce)\\s*\\(\\s*)*$".r

  /** Balanced-paren argument text of the sum( starting at `start`. */
  private def sumArg(q: String, start: Int): String = {
    val open = q.indexOf('(', start)
    var depth = 0
    var j = open
    while (j < q.length) {
      q.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return q.substring(open, j + 1)
        case _ =>
      }
      j += 1
    }
    q.substring(open)
  }

  private def bareSums(q: String): Int =
    SumPat.findAllMatchIn(q).count { m =>
      val before = q.substring(math.max(0, m.start - 80), m.start)
      val castWrapped = CastWrap.findFirstIn(before).isDefined
      lazy val decimalArg = sumArg(q, m.start).toLowerCase.contains("decimal")
      !castWrapped && !decimalArg
    }

  /** Deliberate bare sums, count-pinned. All are intermediate-CTE
    * quantities (pair counts, ADC partial distances, simhash votes,
    * variant-state tallies) consumed inside the query — never output
    * columns — as their green gates prove. */
  private val allowedBareSums: Map[String, Int] = Map(
    "q_a8_funnel" -> 1, // CTE-internal R-flag tally feeding an outer count
    "q_ann5_pq_adc" -> 1, // adist: ordering-only ADC distance
    "q_ann8_ivfpq" -> 1, // adist, as ann5
    "q_ann10_ivfpq_residual" -> 1, // adist, as ann5
    "q_ann11_ivfpq_rerank" -> 1, // adist shortlist, re-ranked exactly after
    "q_bpe1_merges" -> 6, // per-round pair counts (vocab-sized CTEs)
    "q_bpe2_segment" -> 6, // same round chain
    "q_bpe3_corpus_tokens" -> 6, // same round chain
    "q_bpe4_oov_coverage" -> 8, // round chain + vocab length tallies
    "q_bpe5_fertility" -> 6, // per-round pair counts (vocab-sized CTEs)
    "q_bpe7_vocab_coverage" -> 6, // same round chain; output sums CAST-wrapped
    "q_d2_variant_caller" -> 4, // state tallies inside boolean/argmax exprs
    "q_dd3_simhash" -> 16, // per-bit votes, signs consumed into the hash
    // DOUBLE sums (no integer→HUGEINT widening hazard — DuckDB keeps
    // sum(DOUBLE) DOUBLE); each one exits through the fz11 sentinel
    // encoder CASE whose every branch is BIGINT, so the output schema
    // is integral. The 4 sum sites × 4 encoder references + fingerprint
    // shape pin at 20.
    "q_fz11_float_fuzz" -> 20,
    // the must-it-error predicates: sums DELIBERATELY over HUGEINT
    // (the oracle needs INT128 headroom to decide whether Spark's
    // Long-micros interval sum overflows), consumed inside a CASE
    // whose output is BIGINT-cast (`err` 0/1) — never an output-schema
    // sum. 4 error arms + 2 safe-control arms.
    "q_fz29_interval" -> 6,
    // (round-14 note: fz31's epsilon-identity reference sums — 468
    // bare occurrences in round 13 — are now all
    // CAST(sum(…) AS DECIMAL(18,0)) for the sf-stability ADVICE fix,
    // so the family needs no pin anymore; the DECIMAL cast is exactly
    // the wrapping this lint demands)
  )

  test("every oracle sum() is CAST-wrapped, DECIMAL, or count-pinned allowlisted") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val n = bareSums(sql)
        val pinned = allowedBareSums.getOrElse(name, 0)
        if (n == pinned) None
        else Some(s"$name: $n bare sum() occurrences (allowlist pins $pinned)" +
          " — wrap new integer sums as CAST(sum(...) AS BIGINT) or re-pin deliberately")
    }
    assert(violations.isEmpty, violations.mkString("\n", "\n", ""))
  }

  test("allowlist carries no stale entries") {
    val stale = allowedBareSums.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"allowlisted queries without an oracle: $stale")
  }
}
