package graft.operators

import graft.SparkSpec

/** The exact-numeric-fuzz in-JVM half: the DataFrame rendering must
  * equal the common-dialect SQL under Spark for every generated query,
  * so the cross-engine gate (q_fz9) isolates Spark-vs-DuckDB decimal
  * semantics, never DF-vs-SQL drift. Structural lints pin the
  * population's divergence-class disciplines (normalize-before-cast,
  * no raw decimal division, no avg). */
class NumericFuzzSpec extends SparkSpec {

  test("same seed generates the identical numeric population") {
    val a = NumericFuzz.queries().map(_.commonSql)
    val b = NumericFuzz.queries().map(_.commonSql)
    assert(a == b)
    assert(a != NumericFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the exact-numeric surface") {
    val sqls = NumericFuzz.queries().map(_.commonSql)
    val all = sqls.mkString("\n")
    Seq("DECIMAL(12,2)", "round(", "floor(", "ceil(", "abs(", "greatest(",
      "least(", "CASE WHEN", "nullif(", "coalesce(", "sum(", "count(DISTINCT",
      "BETWEEN", "GROUP BY", "HAVING", "WHERE").foreach { op =>
      assert(all.contains(op), s"population never generated $op")
    }
    // the negative-values table must appear (sign conventions are the
    // point of half the surface)
    assert(sqls.exists(_.contains("c_acctbal")), "no negative-capable leaf generated")
    // the div/mod sign pair rides on id%4==1 scalar queries
    assert(sqls.exists(q => q.contains("% ") && q.contains("(0 - CAST(")),
      "no negated-dividend div/mod pair generated")
    // the truncated-mean contract (the avg replacement) must appear
    assert(all.contains("count(*))) / count(*)"), "no truncated mean generated")
  }

  test("discipline lints: every output normalized before the BIGINT cast; no raw decimal division; no avg") {
    val sqls = NumericFuzz.queries().map(_.commonSql)
    for (q <- sqls) {
      assert(!q.contains("avg("), s"avg() is a cross-engine divergence (DOUBLE in DuckDB): $q")
      // raw division may only appear in the truncated-mean spelling
      // "(m - (m % n)) / n" — i.e. always preceded by "))"
      val idx = Iterator.iterate(q.indexOf(" / "))(i => q.indexOf(" / ", i + 1))
        .takeWhile(_ >= 0).toList
      idx.foreach { i =>
        assert(q.substring(0, i).endsWith("))"),
          s"raw division outside the truncated-mean contract at $i: $q")
      }
      // every c_/g_ output is a CAST(... AS BIGINT): the
      // normalize-before-cast rule (DuckDB rounds, Spark truncates on
      // fractional casts — integral values are the shared semantics)
      assert(!q.contains("AS DOUBLE"), s"a double-typed output slipped in: $q")
    }
  }

  test(s"property: all ${NumericFuzz.NQueries} numeric queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = NumericFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = NumericFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == NumericFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > NumericFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
  }
}
