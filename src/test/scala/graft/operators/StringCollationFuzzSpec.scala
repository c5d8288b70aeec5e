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
      "locate(", "replace(", "split_part(", "trim(", " IN (",
      "array_contains(", "array_position(", "COLLATE UTF8_LCASE",
      "COLLATE UNICODE_CI", "COLLATE UTF8_LCASE_RTRIM",
      "COLLATE UNICODE_CI_RTRIM")
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
    val re = qs.filter(q => q.id >= 24 && q.id < 30)
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
    // the composite quarter: both composites appear, the rejected
    // surface (LIKE/regexp) never generates there, and the oracle uses
    // the probed rtrim(lower()) composition for search/equality
    val comp = qs.filter(_.id >= 30)
    assert(comp.size == 12, s"composite quarter drifted: ${comp.map(_.id)}")
    val compSql = comp.map(_.sparkSql).mkString("\n")
    assert(compSql.contains("UTF8_LCASE_RTRIM") &&
      compSql.contains("UNICODE_CI_RTRIM"))
    comp.foreach { q =>
      assert(!q.sparkSql.contains(" LIKE ") && !q.sparkSql.contains("RLIKE") &&
        !q.sparkSql.contains("regexp"),
        s"q${q.id}: generated a surface Spark rejects under composites")
    }
    assert(comp.map(_.duckSql).mkString.contains("rtrim(lower("),
      "composite oracle must compose rtrim over lower")
    // composite replace arms: needle pad-free (replace never trims —
    // a padded needle would silently match nothing and gate vacuum)
    comp.filter(q => (q.id - 30) % 4 == 3).foreach { q =>
      val needle = ", lower\\('([^']*)'\\), 'qz'\\)".r
      val ms = needle.findAllMatchIn(q.duckSql).toSeq
      assert(ms.nonEmpty, s"q${q.id}: rewrite arm lost its replace")
      ms.foreach(m =>
        assert(!m.group(1).endsWith(" "), s"q${q.id}: padded replace needle"))
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

  test("composite search/LIKE boundary and the rtrim-both-operands semantics the oracle composes") {
    // the support boundary: LIKE is DATATYPE_MISMATCH under BOTH
    // composites (pinned one-engine like the regexp boundary — an
    // upgrade that starts accepting it fails here and prompts a gate
    // extension instead of silently leaving the new path untested)
    for (coll <- Seq("UTF8_LCASE_RTRIM", "UNICODE_CI_RTRIM")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"SELECT CAST('x' AS STRING COLLATE $coll) LIKE 'x'").collect())
      assert(e.getCondition.startsWith("DATATYPE_MISMATCH"),
        s"LIKE under $coll should be rejected today")
    }
    // the probed semantics every composite oracle composition rests on
    for (coll <- Seq("UTF8_LCASE_RTRIM", "UNICODE_CI_RTRIM")) {
      def q1(sql: String) = spark.sql(s"SELECT $sql").head()
      def c(e: String) = s"CAST($e AS STRING COLLATE $coll)"
      // search rtrims BOTH operands as whole strings, then matches ci:
      assert(!q1(s"startswith(${c("'  ab'")}, ${c("'a'")})").getBoolean(0),
        s"$coll: leading spaces must be KEPT")
      assert(q1(s"endswith(${c("'ab  '")}, ${c("'B'")})").getBoolean(0),
        s"$coll: haystack trailing spaces must be trimmed")
      assert(q1(s"instr(${c("'abc'")}, ${c("'C '")})").getInt(0) == 3,
        s"$coll: needle trailing spaces must be trimmed, position ci")
      assert(q1(s"locate(${c("'C '")}, ${c("'abc'")})").getInt(0) == 3,
        s"$coll: locate mirrors instr under the composite")
      // replace never trims — a padded needle matches nothing:
      assert(q1(s"replace(${c("'aXBcd'")}, ${c("'xb '")}, 'Q')")
        .getString(0) == "aXBcd", s"$coll: replace must not trim the needle")
      assert(q1(s"replace(${c("'aXBcd  '")}, ${c("'xb'")}, 'Q')")
        .getString(0) == "aQcd  ", s"$coll: replace is plain ci over the raw string")
      // equality is rtrim+ci whole-string:
      assert(q1(s"${c("'aB '")} = ${c("'ab'")}").getBoolean(0), coll)
    }
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
