package graft.operators

import graft.SparkSpec

/** The collation fuzz in-JVM half: rule-family invariance, population
  * pins, and the non-vacuity check that collation actually MERGES the
  * planted case-variants (a gate that never sees a case-collision
  * would pass on binary equality too). */
class CollationFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = CollationFuzz.queries().map(_.sparkSql)
    assert(a == CollationFuzz.queries().map(_.sparkSql))
    assert(a != CollationFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every shape and the dialect split") {
    val qs = CollationFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "GROUP BY CAST(", // collated grouping
      "JOIN",
      "rank() OVER",
      "count(DISTINCT CAST(",
      "COLLATE UTF8_LCASE",
      "upper(", "lower(" // the case mangling + normalization
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // the dialect split, per third: the LCASE third (ids 0–23) pairs
    // COLLATE UTF8_LCASE with DuckDB COLLATE NOCASE; the RTRIM third
    // (24–29) pairs COLLATE UTF8_BINARY_RTRIM with the analytic
    // rtrim() compensation (DuckDB has no RTRIM collation); the
    // UNICODE third (30–41) pairs the ICU collations with the probed
    // ICU-FREE lower()/binary-DESC compensations (the driver's DuckDB
    // can't LOAD the icu extension inside one oracle statement)
    qs.foreach { q =>
      if (q.id < 24) {
        assert(q.sparkSql.contains("COLLATE UTF8_LCASE"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("COLLATE NOCASE"), s"q${q.id} oracle uncollated")
      } else if (q.id < 30) {
        assert(q.sparkSql.contains("COLLATE UTF8_BINARY_RTRIM"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("rtrim(") && !q.duckSql.contains("COLLATE"),
          s"q${q.id} oracle must compensate with rtrim(), not a collation")
      } else if (q.id < 42) {
        assert(q.sparkSql.contains("COLLATE UNICODE"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("lower(") && !q.duckSql.contains("COLLATE"),
          s"q${q.id} oracle must compensate ICU-free via lower()")
      } else {
        // composite quarter: both axes, lower(rtrim()) compensation
        assert(q.sparkSql.contains("COLLATE UTF8_LCASE_RTRIM") ||
          q.sparkSql.contains("COLLATE UNICODE_CI_RTRIM"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("lower(rtrim(") && !q.duckSql.contains("COLLATE"),
          s"q${q.id} oracle must compensate with lower(rtrim())")
      }
    }
    // the RTRIM half plants all three padding variants and covers all
    // three shapes
    val rtrimSql = qs.filter(q => q.id >= 24 && q.id < 30).map(_.sparkSql).mkString("\n")
    Seq("|| '  '", "|| ' '", "GROUP BY CAST(", "JOIN", "count(DISTINCT CAST(")
      .foreach { op =>
        assert(rtrimSql.contains(op), s"RTRIM half never generated: $op")
      }
    // the UNICODE third covers all four shapes, both ICU collations,
    // the widened join key (the fanout-audit lesson), and the
    // case-SENSITIVE rank emulation (lower ASC, raw DESC) in at
    // least one oracle
    val uniSql = qs.filter(_.id >= 30).map(_.sparkSql).mkString("\n")
    Seq("GROUP BY CAST(", "JOIN", "rank() OVER", "count(DISTINCT CAST(",
      "COLLATE UNICODE_CI", "% 499").foreach { op =>
      assert(uniSql.contains(op), s"UNICODE third never generated: $op")
    }
    assert(qs.exists(q => q.id >= 30 &&
      q.sparkSql.contains("COLLATE UNICODE)") &&
      q.duckSql.contains(") DESC")),
      "no case-sensitive ICU rank arm with the binary-DESC oracle emulation")
    // every string exit is normalized — lower() in the LCASE/UNICODE
    // families, rtrim() in the RTRIM family, lower(rtrim()) in the
    // composite quarter (representative choice is engine-internal
    // for collation-equal strings)
    qs.filter(_.sparkSql.contains("AS g,")).foreach { q =>
      val norm =
        if (q.id >= 42) "lower(rtrim(min(CAST("
        else if (q.id >= 24 && q.id < 30) "rtrim(min(CAST("
        else "lower(min(CAST("
      assert(q.sparkSql.contains(norm), s"q${q.id} unnormalized group key")
    }
    // the composite quarter exercises BOTH collation spellings
    val compSql = qs.filter(_.id >= 42).map(_.sparkSql).mkString("\n")
    Seq("COLLATE UTF8_LCASE_RTRIM", "COLLATE UNICODE_CI_RTRIM",
      "GROUP BY CAST(", "JOIN", "count(DISTINCT CAST(", "% 499")
      .foreach { op =>
        assert(compSql.contains(op), s"composite quarter never generated: $op")
      }
  }

  test("the mangling actually plants case-collisions (not vacuous)") {
    // collation must MERGE groups: distinct-under-UTF8_LCASE strictly
    // below distinct-under-binary on the mangled priority column
    CollationFuzz.registerViews(spark, sf0001)
    val r = spark.sql("""SELECT
      count(DISTINCT CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END) AS bin,
      count(DISTINCT CAST(CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END
        AS STRING COLLATE UTF8_LCASE)) AS coll
      FROM __fz28_orders""").head()
    assert(r.getLong(1) < r.getLong(0),
      s"collation merged nothing: binary=${r.getLong(0)} collated=${r.getLong(1)}")
    assert(r.getLong(1) == 5, "priorities collapse to the 5 logical values")
    // same non-vacuity for the ICU half: UNICODE_CI merges the planted
    // case-variants on real data too
    val u = spark.sql("""SELECT
      count(DISTINCT CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END) AS bin,
      count(DISTINCT CAST(CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END
        AS STRING COLLATE UNICODE_CI)) AS coll
      FROM __fz28_orders""").head()
    assert(u.getLong(1) == 5 && u.getLong(1) < u.getLong(0),
      s"UNICODE_CI merged nothing: binary=${u.getLong(0)} collated=${u.getLong(1)}")
  }

  test(s"property: all ${CollationFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    CollationFuzz.registerViews(spark, sf0001)
    for (q <- CollationFuzz.queries()) {
      val on = withRules(on = true)(CollationFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(CollationFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
