package graft.operators

import graft.SparkSpec

/** The regex-fuzz in-JVM half: the DataFrame rendering must equal the
  * Spark-SQL rendering of the same AST for every generated query, so
  * the cross-engine gate (q_fz14, which runs the DuckDB rendering)
  * isolates Java-regex-vs-RE2 semantics over the restricted common
  * syntax. Structural lints pin the excluded divergence classes. */
class RegexFuzzSpec extends SparkSpec {

  test("same seed generates the identical regex population") {
    val a = RegexFuzz.queries().map(_.sparkSql)
    assert(a == RegexFuzz.queries().map(_.sparkSql))
    assert(a != RegexFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises every regex-op family within the safe syntax") {
    val qs = RegexFuzz.queries()
    val spark_ = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    Seq("RLIKE", "regexp_extract(", "regexp_replace(", "regexp_count(",
      "count(DISTINCT", "GROUP BY", "NOT (").foreach { op =>
      assert(spark_.contains(op), s"population never generated $op")
    }
    Seq("regexp_matches(", "regexp_extract_all(", ", 'g')").foreach { op =>
      assert(duck.contains(op), s"DuckDB rendering never emitted $op")
    }
    // syntax families
    Seq("[a-z]", "[0-9]", "[^", "+", "{2}", "{1,3}", "(", "|", "^", "$")
      .foreach { s0 =>
        assert(spark_.contains(s0), s"pattern syntax $s0 never generated")
      }
    // excluded divergence classes:
    for (q <- qs) {
      // no backslash ever (literal-escaping divergence fires before
      // the regex engines do)
      assert(!q.sparkSql.contains("\\"), s"backslash in pattern: ${q.sparkSql}")
      // every Spark regexp_replace is 3-arg (all-matches); every DuckDB
      // one carries the 'g' flag — count call sites match
      def occ(h: String, n: String): Int = h.sliding(n.length).count(_ == n)
      assert(occ(q.duckSql, "regexp_replace(") == occ(q.duckSql, ", 'g')"),
        s"a DuckDB replace lost its 'g' flag: ${q.duckSql}")
      // no replacement backreferences
      assert(!q.sparkSql.contains("$1") && !q.duckSql.contains("\\1"),
        s"replacement backreference: ${q.sparkSql}")
    }
  }

  test(s"property: all ${RegexFuzz.NQueries} regex queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("part", "customer", "orders"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = RegexFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = RegexFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == RegexFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > RegexFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > RegexFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
