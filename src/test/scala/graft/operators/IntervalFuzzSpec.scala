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
