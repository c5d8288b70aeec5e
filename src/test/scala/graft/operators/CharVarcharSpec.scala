package graft.operators

import graft.SparkSpec

/** CHAR(n)/VARCHAR(n) semantics pin (probed in round 13). Spark's
  * length-typed strings have THREE behavior regimes, and silent code
  * that assumes any one of them everywhere is wrong in the other two:
  *
  *  1. EXPRESSION casts under the default config are string no-ops:
  *     `CAST('ab' AS CHAR(5))` neither pads nor changes equality, and
  *     `CAST('abcdef' AS VARCHAR(3))` neither truncates nor errors —
  *     even under ANSI (this build's default).
  *  2. With `spark.sql.preserveCharVarcharTypeInfo=true` the types
  *     become real in expressions: CHAR(5) pads ('ab' → 'ab   ',
  *     length 5, equality against the PADDED form — and NOT against
  *     the unpadded literal), VARCHAR overflow raises
  *     EXCEED_LIMIT_LENGTH.
  *  3. TABLE columns enforce regardless of the conf: a CHAR(5) column
  *     reads back padded; inserting an over-length VARCHAR(3) value
  *     raises EXCEED_LIMIT_LENGTH.
  *
  * No differential gate: DuckDB treats CHAR/VARCHAR length args as
  * pure aliases of VARCHAR (no padding, no enforcement), so there is
  * no oracle — the scope is pinned here instead. */
class CharVarcharSpec extends SparkSpec {

  private def withPreserve[T](on: Boolean)(body: => T): T = {
    val key = "spark.sql.preserveCharVarcharTypeInfo"
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, prev)
  }

  test("regime 1: default expression casts are string no-ops") {
    withPreserve(false) {
      val r = spark.sql("""SELECT '[' || CAST('ab' AS CHAR(5)) || ']',
        length(CAST('ab' AS CHAR(5))),
        CAST('ab' AS CHAR(5)) = 'ab',
        CAST('abcdef' AS VARCHAR(3))""").head()
      assert(r.getString(0) == "[ab]", "no padding in expression position")
      assert(r.getInt(1) == 2)
      assert(r.getBoolean(2), "equality against the unpadded literal")
      assert(r.getString(3) == "abcdef", "no truncation, no error — even under ANSI")
    }
  }

  test("regime 2: preserveCharVarcharTypeInfo makes the types real in expressions") {
    withPreserve(true) {
      val r = spark.sql("""SELECT '[' || CAST('ab' AS CHAR(5)) || ']',
        length(CAST('ab' AS CHAR(5))),
        CAST('ab' AS CHAR(5)) = 'ab   ',
        CAST('ab' AS CHAR(5)) = 'ab',
        typeof(CAST('ab' AS CHAR(5)))""").head()
      assert(r.getString(0) == "[ab   ]", "CHAR pads to its declared length")
      assert(r.getInt(1) == 5)
      assert(r.getBoolean(2), "equality against the PADDED form")
      assert(!r.getBoolean(3),
        "and NOT against the unpadded literal — the sharp edge worth pinning")
      assert(r.getString(4) == "char(5)")
      val e = intercept[Exception](
        spark.sql("SELECT CAST('abcdef' AS VARCHAR(3))").collect())
      assert(e.getMessage.contains("EXCEED_LIMIT_LENGTH"), s"got: $e")
    }
  }

  test("regime 3: table columns enforce regardless of the conf") {
    spark.sql("DROP TABLE IF EXISTS __cv_probe")
    spark.sql("CREATE TABLE __cv_probe (c CHAR(5), v VARCHAR(3)) USING parquet")
    try {
      spark.sql("INSERT INTO __cv_probe VALUES ('ab', 'xy')")
      val r = spark.sql(
        "SELECT '[' || c || ']', length(c), '[' || v || ']' FROM __cv_probe").head()
      assert(r.getString(0) == "[ab   ]", "CHAR column reads back padded")
      assert(r.getInt(1) == 5)
      assert(r.getString(2) == "[xy]")
      val e = intercept[Exception](
        spark.sql("INSERT INTO __cv_probe VALUES ('ab', 'toolong')"))
      assert(e.getMessage.contains("EXCEED_LIMIT_LENGTH"), s"got: $e")
    } finally spark.sql("DROP TABLE IF EXISTS __cv_probe")
  }
}
