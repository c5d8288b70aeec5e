package graft.operators

import graft.SparkSpec

/** The lateral-fuzz in-JVM half: rule-family invariance, the
  * population pins, and the DECORRELATION plan property — a lateral
  * subquery must never execute as a per-outer-row loop. */
class LateralFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = LateralFuzz.queries().map(_.sparkSql)
    assert(a == LateralFuzz.queries().map(_.sparkSql))
    assert(a != LateralFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every lateral shape") {
    val sql = LateralFuzz.queries().map(_.sparkSql).mkString("\n")
    Seq(
      ", LATERAL (", "LEFT JOIN LATERAL",
      "l1.x", // chained lateral reading a previous lateral's column
      "max(", "min(", "count(", "sum(", // ungrouped correlated aggs
      "LIMIT", "ORDER BY", // top-k per outer row
      "GROUP BY" // grouped lateral
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // both correlation flavors: the FK hit and the modular hit-and-miss
    assert(sql.contains("= t.o_custkey") || sql.contains("= t.c_custkey"),
      "no FK-style correlation generated")
    assert(sql.contains("% 2000) * 3 + 1") || sql.contains("% 97) * 5 + 2"),
      "no hit-and-miss correlation generated")
  }

  test(s"property: all ${LateralFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    LateralFuzz.registerViews(spark, sf0001)
    for (q <- LateralFuzz.queries()) {
      val on = withRules(on = true)(LateralFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(LateralFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }

  test("decorrelation: no lateral plans a per-outer-row loop") {
    // the 100 TB property: Spark must decorrelate every generated
    // lateral into a set-based join (hash or sort-merge; broadcast at
    // this SF). A CartesianProduct or per-row nested loop would be
    // O(outer × inner) at scale. Scalar chains (family 0) have no
    // inner table at all — they must collapse into plain projections.
    LateralFuzz.registerViews(spark, sf0001)
    for (q <- LateralFuzz.queries()) {
      val plan = spark.sql(q.sparkSql).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"q${q.id} plans a cartesian product:\n${q.sparkSql}")
      if (q.id % 4 == 0)
        assert(!plan.contains("Join"),
          s"q${q.id}: a scalar lateral chain must collapse to a projection, not join:\n$plan")
      else
        assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
          s"q${q.id}: expected a set-based join after decorrelation:\n$plan")
    }
  }
}
