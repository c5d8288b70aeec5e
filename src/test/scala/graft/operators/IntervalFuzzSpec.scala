package graft.operators

import graft.SparkSpec

/** The interval fuzz in-JVM half: error/answer split pins, the
  * rewrite-exclusion plan pin (interval sums fall through
  * TailFrameRewrite's default arm), and rule-family invariance. */
class IntervalFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = IntervalFuzz.queries().map(_.sparkSql)
    assert(a == IntervalFuzz.queries().map(_.sparkSql))
    assert(a != IntervalFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every family: aggs, div/mul, windows, error arms") {
    val qs = IntervalFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "make_dt_interval", "make_ym_interval",
      "sum(make_dt_interval", "min(make_dt_interval", "max(make_dt_interval",
      "unix_micros(TIMESTAMP '1970-01-01 00:00:00' +", // the micros exit
      ") / ", ") * ", // division + multiplication
      "CAST(o_orderdate AS TIMESTAMP) +", // date + interval
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", // the excluded tail
      "2000000 + o_custkey % 3" // the overflow planting
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // error arms only on orders (sf-stability needs >= 1500 rows)
    qs.filter(_.id % 4 == 3).foreach { q =>
      assert(!q.sparkSql.contains("customer"), s"q${q.id} error arm off orders")
    }
  }

  test("error/answer split: DT and YM overflow arms error, safe arms answer exactly") {
    IntervalFuzz.registerViews(spark, sf0001)
    val expectErr = IntervalFuzz.queries()
      .filter(q => q.id % 4 == 3 && (q.id / 4) % 3 != 2).map(_.id).toSet
    assert(expectErr == Set(3, 7, 15, 19), s"population layout moved: $expectErr")
    for (q <- IntervalFuzz.queries()) {
      IntervalFuzz.outcome(spark, q) match {
        case Left(cond) =>
          assert(expectErr.contains(q.id),
            s"q${q.id} errored unexpectedly ($cond):\n${q.sparkSql}")
          assert(cond.startsWith("INTERVAL_ARITHMETIC_OVERFLOW"),
            s"q${q.id} wrong condition: $cond")
        case Right((n, _)) =>
          assert(!expectErr.contains(q.id),
            s"q${q.id} should have raised INTERVAL_ARITHMETIC_OVERFLOW:\n${q.sparkSql}")
          assert(n > 0, s"q${q.id} answered zero rows")
      }
    }
  }

  test("plan: interval tail-frame sums stay on the original frame (rewrite default-exclude)") {
    // interval types match no arm of TailFrameRewrite's Sum dispatch —
    // the exclusion the round-12 verdict asked this population to pin
    IntervalFuzz.registerViews(spark, sf0001)
    val plan = spark.sql("""SELECT sum(make_dt_interval(0, 0, 0, CAST(c_nationkey % 60 AS INT)))
      OVER (PARTITION BY c_nationkey % 64 ORDER BY c_custkey
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      FROM __fz29_customer""").queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("unboundedfollowing"),
      s"an interval sum hazard frame must keep its original frame:\n$plan")
    // positive control: the running twin needs no rewrite and both
    // orientations answer identically (ON ≡ OFF on the whole family
    // below)
  }

  test("negative-operand interval division: HALF_UP away from zero, pinned one-engine") {
    // The fz29 gate EXCLUDES negative operands by construction (the
    // HALF_UP direction is engine-ambiguous cross-engine), which left
    // Spark's OWN behavior unpinned — a Spark upgrade could silently
    // flip it. Probed 2026-08-16 on 4.1.2: division rounds HALF_UP ON
    // THE MAGNITUDE (ties away from zero), symmetric in sign, at
    // micros for day-time and months for year-month; avg inherits it.
    val micros = Seq(
      // (numerator micros, divisor, expected micros)
      (-5L, 2, -3L), // -2.5 µs → -3 (tie away from zero)
      (-7L, 2, -4L),
      (-2L, 3, -1L), // plain nearest
      (5L, -2, -3L), // negative divisor, same rule
      (-5L, -2, 3L)) // double negative
    for ((n, d, want) <- micros) {
      val got = spark.sql(
        s"""SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00' +
           |  (make_dt_interval(0, 0, 0, CAST($n AS DECIMAL(10,6)) / 1000000)) / $d)
           |""".stripMargin).head().getLong(0)
      assert(got == want, s"${n}us / $d: got $got, want $want")
    }
    val months = Seq((-5, 2, -3), (5, -2, -3), (-5, -2, 3))
    for ((n, d, want) <- months) {
      val got = spark.sql(
        s"SELECT CAST(make_ym_interval(0, $n) / $d AS INT)").head().getInt(0)
      assert(got == want, s"${n}mo / $d: got $got, want $want")
    }
    // avg over a negative set: (-5 + -2)/2 = -3.5 µs → -4
    val avg = spark.sql(
      """SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00' + avg(iv)) FROM
        |(SELECT make_dt_interval(0, 0, 0, -0.000005) AS iv
        | UNION ALL SELECT make_dt_interval(0, 0, 0, -0.000002))
        |""".stripMargin).head().getLong(0)
    assert(avg == -4L, s"avg(-5µs, -2µs): got $avg, want -4")
  }

  test(s"property: all ${IntervalFuzz.NQueries} queries — rule-ON ≡ rule-OFF outcomes") {
    IntervalFuzz.registerViews(spark, sf0001)
    for (q <- IntervalFuzz.queries()) {
      val on = withRules(on = true)(IntervalFuzz.outcome(spark, q))
      val off = withRules(on = false)(IntervalFuzz.outcome(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
