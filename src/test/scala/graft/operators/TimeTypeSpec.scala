package graft.operators

import graft.SparkSpec

/** TIME-type scope pin. Spark 4.1 ships `TimeType` HALF-enabled
  * (probed in round 13): literals, comparisons, min/max, GROUP BY,
  * ORDER BY and the string render work, but every path that would
  * CONSTRUCT a TIME from data — `CAST(string AS TIME)`, `make_time`,
  * `extract` over TIME, TIME ± INTERVAL, parquet write — raises
  * UNSUPPORTED_TIME_TYPE. With no data-driven construction there is
  * no way to build a differential population over the testdata
  * tables, so — like the compressed-codec decode decision — the scope
  * boundary is recorded as a SPEC rather than silently skipped: this
  * suite pins both halves, and flips to a build-failure the moment a
  * Spark upgrade enables the missing surface (at which point an fz
  * population becomes possible and should be built — DuckDB's TIME
  * surface is complete and was probed ready: literals, make_time,
  * casts, interval arithmetic with midnight wraparound, datesub). */
class TimeTypeSpec extends SparkSpec {

  private def unsupportedTime(sql: String): Unit = {
    val e = intercept[Exception](spark.sql(sql).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else (t match {
        case st: org.apache.spark.SparkThrowable if st.getCondition != null =>
          Seq(st.getCondition)
        case _ => Nil
      }) ++ chain(t.getCause)
    assert(chain(e).exists(c => c.startsWith("UNSUPPORTED_TIME_TYPE") ||
        c.startsWith("DATATYPE_MISMATCH")),
      s"expected the TIME-unsupported boundary, got: $e")
  }

  test("the enabled half: literal, render, compare, min/max, group, order") {
    assert(spark.sql("SELECT CAST(TIME '12:30:05' AS STRING)").head().getString(0)
      == "12:30:05")
    assert(spark.sql("SELECT CAST(TIME '12:30:05.123456' AS STRING)")
      .head().getString(0) == "12:30:05.123456", "micros precision renders")
    assert(spark.sql("SELECT typeof(TIME '12:30:05')").head().getString(0)
      == "time(6)")
    assert(spark.sql("SELECT TIME '12:30:00' < TIME '13:00:00'").head().getBoolean(0))
    val mm = spark.sql("""SELECT CAST(min(t) AS STRING), CAST(max(t) AS STRING)
      FROM VALUES (TIME '05:00:00'),(TIME '23:10:11') v(t)""").head()
    assert(mm.getString(0) == "05:00:00" && mm.getString(1) == "23:10:11")
    assert(spark.sql("""SELECT count(*) FROM VALUES (TIME '05:00:00'),(TIME '05:00:00') v(t)
      GROUP BY t""").head().getLong(0) == 2)
    assert(spark.sql("""SELECT CAST(t AS STRING) FROM VALUES (TIME '23:00:00'),(TIME '05:00:00') v(t)
      ORDER BY t LIMIT 1""").head().getString(0) == "05:00:00")
  }

  test("the disabled half: every data-construction path raises (the fz31 scope pin)") {
    // if ANY of these starts working after a Spark upgrade, this test
    // fails on purpose: build the TIME differential population then
    unsupportedTime("SELECT CAST('13:01:02' AS TIME)")
    unsupportedTime("SELECT make_time(13, 1, CAST(2.5 AS DECIMAL(8,6)))")
    unsupportedTime("SELECT extract(HOUR FROM TIME '12:30:05')")
    unsupportedTime("SELECT TIME '12:30:05' + INTERVAL '90' MINUTE")
    unsupportedTime("SELECT CAST(TIMESTAMP_NTZ '2020-01-01 12:30:05' AS TIME)")
    unsupportedTime("SELECT CAST(TIME '12:30:05' AS TIMESTAMP_NTZ)")
    val e = intercept[Exception] {
      spark.sql("SELECT TIME '12:30:05' AS t").write.mode("overwrite")
        .parquet("/tmp/__graft_time_probe")
    }
    assert(e.getMessage.contains("UNSUPPORTED_TIME_TYPE"),
      s"parquet write should hit the same boundary: $e")
  }
}
