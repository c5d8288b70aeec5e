package graft.operators

import graft.SparkSpec

/** The window/set-op-fuzz in-JVM half: the DataFrame rendering (real
  * `Window` + `functions._` trees) must equal the common-dialect SQL
  * under Spark for every generated query — so the cross-engine gate
  * (q_fz4) isolates Spark-vs-DuckDB semantics, never DF-vs-SQL drift.
  * The determinism discipline (unique-order appendix for physical-
  * order-dependent functions, tie-friendly orders for rank/RANGE) is
  * what makes each fingerprint a legitimate multiset gate. */
class WindowSetFuzzSpec extends SparkSpec {

  test("same seed generates the identical window/set-op population") {
    val a = WindowSetFuzz.queries().map(_.commonSql)
    val b = WindowSetFuzz.queries().map(_.commonSql)
    assert(a == b)
    assert(a != WindowSetFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the whole window + set-op surface") {
    val sqls = WindowSetFuzz.queries().map(_.commonSql).mkString("\n")
    Seq("row_number()", "rank()", "dense_rank()", "ntile(",
      "ROWS BETWEEN", "RANGE BETWEEN", "UNBOUNDED PRECEDING",
      "PRECEDING", "FOLLOWING", "CURRENT ROW",
      "lag(", "lead(", "first_value(", "last_value(",
      "NULLS FIRST", "NULLS LAST", "DESC", "nullif(",
      "UNION ALL", "INTERSECT", "EXCEPT",
      "count(DISTINCT", "GROUP BY").foreach { op =>
      assert(sqls.contains(op), s"population never generated $op")
    }
    // both multiset (ALL) and distinct set-op forms must appear
    assert(sqls.contains("INTERSECT ALL") || sqls.contains("EXCEPT ALL"),
      "no multiset set-op form generated")
    // NULL-semantics coverage is guaranteed, not probabilistic: set ops
    // compare NULLs as equal (IS NOT DISTINCT) and distinct aggregation
    // ignores them — at least one of each shape must carry nullif
    val queries = WindowSetFuzz.queries().map(_.commonSql)
    assert(queries.exists(q => q.contains("nullif(") &&
      Seq("UNION", "INTERSECT", "EXCEPT").exists(q.contains)),
      "no set-op query exercises NULL equality")
    assert(queries.exists(q => q.contains("nullif(") && q.contains("GROUP BY")),
      "no distinct-agg query exercises NULL keys/values")
    // two-level window chains (rank of a window result) are id-cycled
    // into the population — at least one must be present
    assert(queries.exists(_.contains("ORDER BY w_0")),
      "no window-over-window chain generated")
  }

  test(s"property: all ${WindowSetFuzz.NQueries} window/set-op queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = WindowSetFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = WindowSetFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == WindowSetFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > WindowSetFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
  }

  test("lint: physical-order-dependent functions always order-by the unique key last") {
    // the fz1 lesson as a structural property of the generator itself:
    // row_number/ntile/lag/lead/first_value/last_value and ROWS frames
    // are only multiset-deterministic when the ORDER BY ends with the
    // table's unique key — verify every generated OVER clause complies
    val orderDependent = Seq("row_number()", "ntile(", "lag(", "lead(",
      "first_value(", "last_value(", "ROWS BETWEEN")
    val keyTail = Seq("o_orderkey ASC NULLS LAST", "c_custkey ASC NULLS LAST")
    WindowSetFuzz.queries().foreach { q =>
      val sql = q.commonSql
      if (orderDependent.exists(sql.contains)) {
        // every OVER (...) clause must carry the key tail; a paren
        // matcher (not a regex) because order exprs can nest parens
        val overs = {
          val out = Seq.newBuilder[String]
          var i = sql.indexOf("OVER (")
          while (i >= 0) {
            var j = i + 5; var depth = 0; var end = -1
            val start = j
            while (j < sql.length && end < 0) {
              sql(j) match {
                case '(' => depth += 1
                case ')' => depth -= 1; if (depth == 0) end = j
                case _ =>
              }
              j += 1
            }
            out += sql.substring(start + 1, end)
            i = sql.indexOf("OVER (", j)
          }
          out.result()
        }
        assert(overs.nonEmpty, s"q${q.id}: order-dependent fn without OVER? $sql")
        overs.foreach { o =>
          assert(keyTail.exists(o.contains),
            s"q${q.id}: order-dependent window lacks the unique-key tail: $sql")
        }
      }
    }
  }
}
