package graft.operators

import graft.SparkSpec

/** The error-fuzz in-JVM half: the injected optimizer-rule family
  * must not change WHETHER a query errors, WHICH condition it raises,
  * or the values it answers with — the property that would have
  * caught the round-11 TailFrameRewrite ANSI hole mechanically —
  * plus structural lints pinning the id-cycled arms. */
class ErrorFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical error population") {
    val a = ErrorFuzz.queries().map(_.sparkSql)
    assert(a == ErrorFuzz.queries().map(_.sparkSql))
    assert(a != ErrorFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every error family and the safe twins") {
    val qs = ErrorFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "* 50000000000000000", // overflow multiplier
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", // tail frames
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", // running frames
      "VALUES (1, 9223372036854775807), (2, 1), (3, -1)", // suppression fixture
      "(2, 5000000000000000000), (3, -6000000000000000000)", // prefix-only overflow
      "concat('x', ", // invalid cast input
      "AS SMALLINT)", // cast overflow
      " div ", " % ", // division / remainder
      "element_at(", // array indexing
      ", 3)", ", 0)", // OOB + zero index
      // round-12 extension block
      "AS DECIMAL(5,0)", // narrow-decimal final-value overflow
      "ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING", // k-PRECEDING fixture twin
      "ROWS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING", // k-FOLLOWING fixture
      "(1, -3), (2, 9223372036854775807), (3, 2)", // interval-not-prefix overflow
      "AS DATE)", // ANSI date casts
      "element_at" // variable-index arms ride the same function
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // the rewritable INT tail arm may cycle onto any table; at least
    // one tail-safe arm must carry an INT child so TailFrameRewrite
    // fires INSIDE this gate
    assert(qs.exists(q => q.sparkSql.contains("AS INT) * 1000") &&
      q.sparkSql.contains("UNBOUNDED FOLLOWING")),
      "no rewritable (INT-child) tail arm in the population")
  }

  test(s"property: all ${ErrorFuzz.NQueries} queries — rule-ON ≡ rule-OFF (error class AND values)") {
    val qs = ErrorFuzz.queries()
    // views registered once via outcomes(); reuse its side effect
    ErrorFuzz.outcomes(spark, sf0001)
    var errored = 0
    var answered = 0
    for (q <- qs) {
      val on = withRules(on = true)(ErrorFuzz.outcome(spark, q))
      val off = withRules(on = false)(ErrorFuzz.outcome(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
      on match {
        case Left(cond) =>
          errored += 1
          assert(ErrorFuzz.ExpectedConditions.contains(cond),
            s"q${q.id} raised an unexpected condition $cond")
        case Right(_) => answered += 1
      }
    }
    // both halves must be populated — an all-error population never
    // tests value agreement, an all-answer one never error agreement
    assert(errored >= 12, s"only $errored erroring queries at sf0.001")
    assert(answered >= 12, s"only $answered answering queries at sf0.001")
  }

  test("the round-11 suppression fixture errors under BOTH rule modes") {
    // [Long.MaxValue, 1, -1] tail frame: forward accumulation must
    // raise ARITHMETIC_OVERFLOW; the unfixed TailFrameRewrite
    // reversed it into a silently-answering plan — this is the
    // mechanical re-catch
    val fixture = ErrorFuzz.queries().find(q =>
      q.sparkSql.contains("9223372036854775807), (2, 1), (3, -1)")).get
    ErrorFuzz.outcomes(spark, sf0001) // ensure views exist
    assert(withRules(on = true)(ErrorFuzz.outcome(spark, fixture)) ==
      Left("ARITHMETIC_OVERFLOW"), "rule-ON must not suppress the overflow")
    assert(withRules(on = false)(ErrorFuzz.outcome(spark, fixture)) ==
      Left("ARITHMETIC_OVERFLOW"))
  }
}
