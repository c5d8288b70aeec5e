package graft.operators

import graft.SparkSpec

/** The IGNORE NULLS fuzz in-JVM half: rule-family invariance, the
  * population-shape pins, and the total-order discipline the
  * synthetic lineitem cannot satisfy. */
class WindowNullsFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = WindowNullsFuzz.queries().map(_.sparkSql)
    assert(a == WindowNullsFuzz.queries().map(_.sparkSql))
    assert(a != WindowNullsFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every IGNORE NULLS shape — and never lineitem") {
    val qs = WindowNullsFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "IGNORE NULLS",
      "lead(", "lag(", "nth_value(", "first_value(", "last_value(",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", // running
      "PRECEDING AND", "FOLLOWING)", // sliding frames
      ", 0) IGNORE NULLS", // lead/lag with an explicit default
      "THEN NULL ELSE" // data-dependent null pattern
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // every function here is order-sensitive, and the synthetic
    // lineitem has NO unique key (its (l_orderkey, l_linenumber)
    // pairs collide — 11,785 duplicates at sf0.01, measured; the
    // first-run sf0.01 gate caught exactly this as a q3/q8/q22
    // mismatch). Only verified-unique-key tables may appear.
    assert(!sql.contains("lineitem"),
      "order-sensitive population must not use the collision-keyed lineitem")
    // the RESPECT-vs-IGNORE contrast arm exists
    assert(qs.exists(_.outCols == Seq("k", "a_0", "a_1")),
      "no RESPECT-vs-IGNORE contrast arm in the population")
  }

  test(s"property: all ${WindowNullsFuzz.NQueries} queries — rule-ON ≡ rule-OFF; the modifier changes values") {
    WindowNullsFuzz.registerViews(spark, sf0001)
    for (q <- WindowNullsFuzz.queries()) {
      val on = withRules(on = true)(WindowNullsFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(WindowNullsFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
    // the contrast arms must show the modifier DOING something at
    // sf0.001 — a population whose IGNORE NULLS never skips a null
    // would gate vacuously
    val contrasts = WindowNullsFuzz.queries().filter(_.outCols.size == 3)
    val differing = contrasts.count { q =>
      spark.sql(q.sparkSql).collect().exists { r =>
        val a0 = Option(r.get(r.fieldIndex("a_0")))
        val a1 = Option(r.get(r.fieldIndex("a_1")))
        a0 != a1
      }
    }
    assert(differing >= contrasts.size / 2,
      s"only $differing/${contrasts.size} contrast arms differ RESPECT vs IGNORE at sf0.001")
  }
}
