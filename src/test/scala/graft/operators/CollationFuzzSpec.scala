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
    // the dialect split, per half: the LCASE half (ids 0–23) pairs
    // COLLATE UTF8_LCASE with DuckDB COLLATE NOCASE; the RTRIM half
    // (24–29) pairs COLLATE UTF8_BINARY_RTRIM with the analytic
    // rtrim() compensation (DuckDB has no RTRIM collation)
    qs.foreach { q =>
      if (q.id < 24) {
        assert(q.sparkSql.contains("COLLATE UTF8_LCASE"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("COLLATE NOCASE"), s"q${q.id} oracle uncollated")
      } else {
        assert(q.sparkSql.contains("COLLATE UTF8_BINARY_RTRIM"), s"q${q.id} uncollated")
        assert(q.duckSql.contains("rtrim(") && !q.duckSql.contains("COLLATE"),
          s"q${q.id} oracle must compensate with rtrim(), not a collation")
      }
    }
    // the RTRIM half plants all three padding variants and covers all
    // three shapes
    val rtrimSql = qs.filter(_.id >= 24).map(_.sparkSql).mkString("\n")
    Seq("|| '  '", "|| ' '", "GROUP BY CAST(", "JOIN", "count(DISTINCT CAST(")
      .foreach { op =>
        assert(rtrimSql.contains(op), s"RTRIM half never generated: $op")
      }
    // every string exit is normalized — lower() in the LCASE half,
    // rtrim() in the RTRIM half (representative choice is
    // engine-internal for collation-equal strings)
    qs.filter(_.sparkSql.contains("AS g,")).foreach { q =>
      val norm = if (q.id < 24) "lower(min(CAST(" else "rtrim(min(CAST("
      assert(q.sparkSql.contains(norm), s"q${q.id} unnormalized group key")
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
