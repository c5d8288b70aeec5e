package graft.operators

import graft.SparkSpec

/** The collated string-function fuzz in-JVM half: population pins
  * (every function family and both collation codepaths appear; LIKE
  * stays off the ICU path where Spark rejects it), the non-vacuity
  * check that the collation actually WIDENS the match set on the
  * planted case-mangled data, and rule-family invariance. */
class StringCollationFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = StringCollationFuzz.queries().map(_.sparkSql)
    assert(a == StringCollationFuzz.queries().map(_.sparkSql))
    assert(a != StringCollationFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every function family and both collation codepaths") {
    val qs = StringCollationFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq("contains(", "startswith(", "endswith(", " LIKE ", "instr(",
      "replace(", "split_part(", "trim(", " IN (", "array_contains(",
      "array_position(", "COLLATE UTF8_LCASE", "COLLATE UNICODE_CI")
      .foreach { op =>
        assert(sql.contains(op), s"population never generated: $op")
      }
    // LIKE exists only for UTF8 collations (probed DATATYPE_MISMATCH
    // under UNICODE_CI) — every LIKE arm must be on UTF8_LCASE
    qs.filter(_.sparkSql.contains(" LIKE ")).foreach { q =>
      assert(!q.sparkSql.contains("UNICODE_CI"),
        s"q${q.id}: LIKE generated on the ICU path Spark rejects")
    }
    // rewrite exits lower-normalize BOTH dialects (replacement case
    // is the one engine freedom there)
    qs.filter(q => q.id < 24 && q.id % 4 == 2).foreach { q =>
      assert(q.sparkSql.contains("lower(replace(") &&
        q.duckSql.contains("replace(lower("), s"q${q.id} unnormalized rewrite")
    }
    // the oracle never names a collation — ICU-free by construction
    qs.foreach(q => assert(!q.duckSql.contains("COLLATE"),
      s"q${q.id}: oracle must stay ICU/collation-free"))
    // the regexp quarter: all three shapes, UTF8_LCASE only (Spark
    // rejects regexp on every other collation family), global-flag
    // compensation on the DuckDB replace
    val re = qs.filter(_.id >= 24)
    assert(re.nonEmpty && re.forall(q =>
      q.sparkSql.contains("UTF8_LCASE") && !q.sparkSql.contains("UNICODE")))
    Seq(" RLIKE ", "regexp_count(", "regexp_extract(", "regexp_replace(")
      .foreach { op =>
        assert(re.map(_.sparkSql).mkString.contains(op),
          s"regexp quarter never generated: $op")
      }
    re.filter(q => (q.id - 24) % 3 == 2).foreach { q =>
      assert(q.duckSql.contains("'qz', 'g')"),
        s"q${q.id}: DuckDB replace needs the global flag (Spark's is global)")
    }
  }

  test("regexp × collation boundary: only UTF8_LCASE compiles; ICU and RTRIM reject") {
    // pinned one-engine so an upgrade that starts ACCEPTING these
    // (presumably via ICU regex) fails here and prompts a gate
    // extension rather than silently leaving the new path untested
    def err(coll: String): String =
      intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"SELECT CAST('x' AS STRING COLLATE $coll) RLIKE 'x'").collect()
      ).getCondition
    for (coll <- Seq("UNICODE_CI", "UTF8_LCASE_RTRIM", "UNICODE"))
      assert(err(coll).startsWith("DATATYPE_MISMATCH"),
        s"regexp under $coll should be rejected today")
    // and the accepted family is genuinely case-insensitive
    assert(spark.sql(
      "SELECT CAST('apple' AS STRING COLLATE UTF8_LCASE) RLIKE 'APP'")
      .head().getBoolean(0))
  }

  test("collated search actually widens the match set (not vacuous)") {
    StringCollationFuzz.registerViews(spark, sf0001)
    // the planted mangling uppercases a third of rows: a ci 'urgent'
    // needle must match strictly more rows than the binary needle
    val r = spark.sql("""SELECT
      count(CASE WHEN contains(CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END,
        'urgent') THEN 1 END) AS bin,
      count(CASE WHEN contains(CAST(CASE WHEN o_custkey % 3 = 0 THEN upper(o_orderpriority)
        WHEN o_custkey % 3 = 1 THEN lower(o_orderpriority) ELSE o_orderpriority END
        AS STRING COLLATE UTF8_LCASE), CAST('urgent' AS STRING COLLATE UTF8_LCASE))
        THEN 1 END) AS coll
      FROM __fz32_orders""").head()
    assert(r.getLong(1) > r.getLong(0),
      s"collation widened nothing: binary=${r.getLong(0)} collated=${r.getLong(1)}")
    assert(r.getLong(0) > 0, "binary baseline must be non-degenerate")
  }

  test(s"property: all ${StringCollationFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    StringCollationFuzz.registerViews(spark, sf0001)
    for (q <- StringCollationFuzz.queries()) {
      val on = withRules(on = true)(StringCollationFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(StringCollationFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
