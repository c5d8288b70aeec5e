package graft.operators

import graft.SparkSpec

/** The TIMESTAMP_NTZ fuzz in-JVM half: population pins, rule-family
  * invariance, and the session-TZ behavior the DuckDB oracle cannot
  * reach (the driver's DuckDB process owns its TimeZone; one-statement
  * oracles cannot SET it): NTZ values are wall-clock-invariant under
  * session-TZ changes, while their conversion to session-zoned
  * TIMESTAMP shifts by exactly the zone offset. */
class NtzFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  private def withTz[T](tz: String)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("same seed generates the identical population") {
    val a = NtzFuzz.queries().map(_.sparkSql)
    assert(a == NtzFuzz.queries().map(_.sparkSql))
    assert(a != NtzFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every family and the dialect compensations") {
    val qs = NtzFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "TIMESTAMP_NTZ", "make_dt_interval",
      "extract(HOUR FROM", "extract(DOW FROM",
      "date_trunc('month'",
      "RANGE BETWEEN INTERVAL '", "' HOUR PRECEDING",
      "timestampadd(", "timestampdiff("
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    val duck = qs.map(_.duckSql).mkString("\n")
    // the probed compensations must be present in the oracle rendering
    assert(duck.contains("+ 1 AS BIGINT) AS a_4"), "DOW off-by-one uncompensated")
    assert(duck.contains("CAST(date_trunc('month'"), "date_trunc twin missing")
    assert(duck.contains("datesub("), "datesub (complete units) missing")
    assert(!duck.contains("date_diff("),
      "date_diff counts boundary crossings — datesub is the Spark twin")
  }

  test("NTZ is wall-clock-invariant under session-TZ changes; LTZ conversion shifts") {
    // the surface the oracle can't reach: same NTZ value, three
    // session zones — its string render must not move, while the
    // instant of CAST(ntz AS TIMESTAMP) moves by the zone offset
    val q = "SELECT CAST(TIMESTAMP_NTZ '2020-06-01 12:00:00' AS STRING) AS s, " +
      "unix_micros(CAST(TIMESTAMP_NTZ '2020-06-01 12:00:00' AS TIMESTAMP)) AS us"
    val utc = withTz("UTC")(spark.sql(q).head())
    val ny = withTz("America/New_York")(spark.sql(q).head())
    val tokyo = withTz("Asia/Tokyo")(spark.sql(q).head())
    assert(utc.getString(0) == "2020-06-01 12:00:00")
    assert(ny.getString(0) == utc.getString(0) && tokyo.getString(0) == utc.getString(0),
      "NTZ string render must not depend on the session zone")
    // NY is UTC-4 in June (DST): wall 12:00 NY = 16:00 UTC → +4h
    assert(ny.getLong(1) - utc.getLong(1) == 4L * 3600 * 1000000,
      s"NY conversion must shift the instant by +4h, got ${ny.getLong(1) - utc.getLong(1)}")
    // Tokyo is UTC+9, no DST: wall 12:00 JST = 03:00 UTC → −9h
    assert(tokyo.getLong(1) - utc.getLong(1) == -9L * 3600 * 1000000)
    // and the reverse direction: one INSTANT renders as three walls
    val inst = "SELECT CAST(CAST(TIMESTAMP '2020-06-01 12:00:00' AS TIMESTAMP_NTZ) AS STRING) AS s"
    assert(withTz("UTC")(spark.sql(inst).head().getString(0)) == "2020-06-01 12:00:00")
    assert(withTz("Asia/Tokyo")(spark.sql(inst).head().getString(0)) == "2020-06-01 12:00:00",
      "LTZ literal re-parsed per zone: the NTZ cast reads the session wall clock")
  }

  test("NTZ order keys are rewrite-eligible (bit-stable), interval sums are not") {
    // cross-check with TailFrameRewrite's type guard: min over NTZ is
    // bit-stable → a hazard frame REWRITES; the fz29 exclusion keeps
    // interval SUMS quadratic. Both directions pinned here on an NTZ
    // fixture.
    NtzFuzz.registerViews(spark, sf0001)
    val rewrite = spark.sql("""SELECT min(CAST(o_orderdate AS TIMESTAMP_NTZ))
      OVER (PARTITION BY o_custkey % 64 ORDER BY o_orderkey
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      FROM __fz30_orders""").queryExecution.executedPlan.toString.toLowerCase
    assert(!rewrite.contains("unboundedfollowing"),
      s"min(NTZ) is bit-stable and must rewrite:\n$rewrite")
  }

  test(s"property: all ${NtzFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    NtzFuzz.registerViews(spark, sf0001)
    for (q <- NtzFuzz.queries()) {
      val on = withRules(on = true)(NtzFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(NtzFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
