package graft.operators

import graft.SparkSpec

/** The statistical-aggregate fuzz in-JVM half: population pins,
  * rule-family invariance, the epsilon-arms-are-actually-true check
  * (a gate of booleans is vacuous if an arm silently renders 'false'
  * on BOTH sides), and the Spark-convention pins for skewness/
  * kurtosis — excluded from the gate because the engines use
  * different CONVENTIONS (probed: Spark population-moment skewness
  * 0.768 vs DuckDB bias-corrected 1.331 on the same four rows;
  * kurtosis −1.0 excess-population vs 1.5), so Spark's own convention
  * is pinned here against exact central moments instead. */
class StatsAggFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = StatsAggFuzz.queries().map(_.sparkSql)
    assert(a == StatsAggFuzz.queries().map(_.sparkSql))
    assert(a != StatsAggFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every family") {
    val qs = StatsAggFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "median(", "percentile_cont(", "WITHIN GROUP", "mode(",
      "var_pop(", "var_samp(", "stddev_pop(", "stddev_samp(",
      "covar_pop(", "covar_samp(", "corr(", "regr_slope(", "regr_intercept(",
      "THEN 500", // the ungrouped planted majority
      ") * 17 + 5" // the grouped planted majority
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // dyadic percentiles only — anything off the 1/8 grid breaks the
    // ×8 integral exit
    val pPat = "percentile_cont\\((0\\.\\d+)\\)".r
    qs.foreach { q =>
      pPat.findAllMatchIn(q.sparkSql).foreach { m =>
        assert(Set("0.5", "0.25", "0.75", "0.125").contains(m.group(1)),
          s"q${q.id} non-dyadic percentile ${m.group(1)}")
      }
    }
  }

  test("epsilon arms evaluate to TRUE on the Spark side (the gate is not vacuous)") {
    // every a_i of the variance/corr families must be the string
    // 'true' — a silently-false arm would still hash-match a
    // silently-false oracle
    StatsAggFuzz.registerViews(spark, sf0001)
    for (q <- StatsAggFuzz.queries() if q.id % 4 >= 2) {
      val boolCols = q.outCols.filter(_.startsWith("a_")).dropRight(1) // last is count
      val bad = spark.sql(q.sparkSql)
        .selectExpr(boolCols.map(c => s"sum(CASE WHEN $c = 'true' THEN 0 ELSE 1 END) AS $c"): _*)
        .head()
      boolCols.indices.foreach { i =>
        assert(bad.getLong(i) == 0,
          s"q${q.id} ${boolCols(i)}: ${bad.getLong(i)} rows off the exact-rational identity\n${q.sparkSql}")
      }
    }
  }

  test("exact arms: median/percentile_cont land on the dyadic grid; mode finds the plant") {
    StatsAggFuzz.registerViews(spark, sf0001)
    // spot-fix a known fixture rather than re-deriving the generator:
    // median of 1..4 = 2.5 → ×2 = 5; pcont(0.25) of 0..3 = 0.75 → ×8 = 6
    val r = spark.sql("""SELECT CAST(median(v) * 2 AS BIGINT),
      CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY v) * 8 AS BIGINT)
      FROM VALUES (1),(2),(3),(4) t(v)""").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 14L)
    // the ungrouped mode arms must return the planted 500
    for (q <- StatsAggFuzz.queries()
         if q.id % 4 == 1 && q.sparkSql.contains("THEN 500")) {
      val modes = spark.sql(q.sparkSql).select("a_0").collect().map(_.getLong(0))
      assert(modes.forall(_ == 500L), s"q${q.id} mode missed the planted majority: ${modes.toSeq}")
    }
  }

  test("skewness/kurtosis: Spark's population-moment convention vs exact central moments") {
    // excluded from the cross-engine gate (convention mismatch) —
    // pinned here against exact moments on a fixed integer fixture:
    // skew = m3 / m2^1.5, kurt = m4 / m2^2 − 3 (population, excess)
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 4.0, 9.0)
    val n = xs.size
    val mean = xs.sum / n
    def m(k: Int) = xs.map(x => math.pow(x - mean, k)).sum / n
    val expSkew = m(3) / math.pow(m(2), 1.5)
    val expKurt = m(4) / (m(2) * m(2)) - 3
    val r = spark.sql(
      "SELECT skewness(v), kurtosis(v) FROM VALUES (1),(2),(4),(9) t(v)").head()
    assert(math.abs(r.getDouble(0) - expSkew) < 1e-12,
      s"skewness ${r.getDouble(0)} != population-moment $expSkew")
    assert(math.abs(r.getDouble(1) - expKurt) < 1e-12,
      s"kurtosis ${r.getDouble(1)} != excess-population $expKurt")
  }

  test(s"property: all ${StatsAggFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    StatsAggFuzz.registerViews(spark, sf0001)
    for (q <- StatsAggFuzz.queries()) {
      val on = withRules(on = true)(StatsAggFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(StatsAggFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
