package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The try-fuzz in-JVM half: the injected optimizer-rule family must
  * not change the VALUES (including which rows/aggregates the TRY
  * hatch nulls) of any query in the population — the property that
  * catches a rule consulting session state instead of the
  * expression's own eval mode (the round-12 TailFrameRewrite finding)
  * — plus plan pins for both rewrite directions and the probed
  * sticky-NULL semantics. */
class TryFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical try population") {
    val a = TryFuzz.queries().map(_.sparkSql)
    assert(a == TryFuzz.queries().map(_.sparkSql))
    assert(a != TryFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every hatch family") {
    val sql = TryFuzz.queries().map(_.sparkSql).mkString("\n")
    Seq(
      "try_sum(", "try_add(", "try_subtract(", "try_multiply(",
      "try_divide(", "try_mod(", "try_cast(", "try_element_at(",
      "* 50000000000000000", // overflow multiplier
      "(VALUES (1, 9223372036854775807), (2, 1), (3, -1))", // the round-12 fixture
      "(2, 5000000000000000000), (3, -6000000000000000000)", // stickiness fixture
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", // tail frames
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", // running frames
      "AS DECIMAL(19,0))", // decimal narrowing arms
      "AS SMALLINT)", "AS DATE)", // cast targets
      "GROUP BY" // per-group hatch independence
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // the rewritable INT tail arm must exist so TailFrameRewrite fires
    // INSIDE this TRY gate
    assert(TryFuzz.queries().exists(q =>
      q.sparkSql.contains("AS INT) * 1000") &&
        q.sparkSql.contains("UNBOUNDED FOLLOWING")),
      "no rewritable (INT-child) tail arm in the population")
  }

  test(s"property: all ${TryFuzz.NQueries} queries — rule-ON ≡ rule-OFF values; both hatch halves fire") {
    TryFuzz.registerViews(spark, sf0001)
    var nulled = 0
    var clean = 0
    for (q <- TryFuzz.queries()) {
      val on = withRules(on = true)(TryFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(TryFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
      val anyNull = spark.sql(q.sparkSql).collect()
        .exists(r => q.outCols.indices.exists(i => r.isNullAt(r.fieldIndex(q.outCols(i)))))
      if (anyNull) nulled += 1 else clean += 1
    }
    // both halves must be populated: a population whose hatches never
    // fire tests nothing TRY-specific, one that always fires never
    // tests value agreement
    assert(nulled >= 12, s"only $nulled queries fired a TRY NULL at sf0.001")
    assert(clean >= 8, s"only $clean queries stayed fully non-NULL at sf0.001")
  }

  test("the round-12 suppression fixture answers (NULL, 0, -1) and does not rewrite") {
    // [Long.MaxValue, 1, -1] tail frame: forward accumulation nulls
    // the full frame; the conf-keyed TailFrameRewrite reversed it and
    // silently answered Long.MaxValue — this is the mechanical
    // re-catch in the hatch direction (fz19 pins the ANSI-error twin)
    val fixture = TryFuzz.queries().find(q =>
      q.sparkSql.contains("(1, 9223372036854775807), (2, 1), (3, -1)")).get
    val plan = spark.sql(fixture.sparkSql)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("unboundedfollowing"),
      s"a TRY-mode Long tail sum must keep its original frame:\n$plan")
    def rows(r: Array[Row]) =
      r.map(x => (x.getInt(0), Option(x.get(1)))).sortBy(_._1).toSeq
    val on = withRules(on = true)(rows(spark.sql(fixture.sparkSql).collect()))
    val off = withRules(on = false)(rows(spark.sql(fixture.sparkSql).collect()))
    assert(on == off)
    assert(on.map(_._2) == Seq(None, Some(0L), Some(-1L)),
      s"forward accumulation must NULL exactly the full frame: $on")
  }

  test("sticky NULL: a running try_sum never recovers after overflow") {
    // probed semantics the oracle encodes: the prefix re-enters Long
    // range at row 3 (5e18 + 5e18 - 6e18 = 4e18) but the accumulator
    // nulled at row 2 and stays NULL
    val fixture = TryFuzz.queries().find(q =>
      q.sparkSql.contains("(2, 5000000000000000000), (3, -6000000000000000000)")).get
    val r = spark.sql(fixture.sparkSql).collect()
      .map(x => (x.getInt(0), Option(x.get(1)))).sortBy(_._1).toSeq
    assert(r.map(_._2) == Seq(Some(5000000000000000000L), None, None),
      s"running try_sum must be sticky: $r")
  }

  test("the INT-child tail arm rewrites to the running twin inside the TRY gate") {
    TryFuzz.registerViews(spark, sf0001)
    val q = TryFuzz.queries().find(x =>
      x.sparkSql.contains("AS INT) * 1000") &&
        x.sparkSql.contains("UNBOUNDED FOLLOWING")).get
    val planOn = withRules(on = true)(
      spark.sql(q.sparkSql).queryExecution.executedPlan.toString.toLowerCase)
    assert(!planOn.contains("unboundedfollowing"),
      s"the INT-child TRY tail sum must rewrite (Long-buffer headroom):\n$planOn")
    val planOff = withRules(on = false)(
      spark.sql(q.sparkSql).queryExecution.executedPlan.toString.toLowerCase)
    assert(planOff.contains("unboundedfollowing"),
      "rule-OFF must expose the original quadratic frame (escape hatch intact)")
  }
}
