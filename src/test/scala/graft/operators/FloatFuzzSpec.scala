package graft.operators

import graft.SparkSpec

/** The float-fuzz in-JVM half: the DataFrame rendering must equal the
  * common-dialect SQL under Spark for every generated query, so the
  * cross-engine gate (q_fz11) isolates Spark-vs-DuckDB IEEE
  * special-value semantics. Structural lints pin the encoder
  * discipline — no raw double may ever reach an output. */
class FloatFuzzSpec extends SparkSpec {

  test("same seed generates the identical float population") {
    val a = FloatFuzz.queries().map(_.commonSql)
    assert(a == FloatFuzz.queries().map(_.commonSql))
    assert(a != FloatFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the special-value surface") {
    val sqls = FloatFuzz.queries().map(_.commonSql)
    val all = sqls.mkString("\n")
    Seq("CAST('NaN' AS DOUBLE)", "CAST('Infinity' AS DOUBLE)",
      "CAST('-Infinity' AS DOUBLE)", "CAST('-0.0' AS DOUBLE)",
      "isnan(", "greatest(", "least(", "abs(", "nullif(", "coalesce(",
      "count(DISTINCT", "min(w)", "max(w)", "sum(w)", "GROUP BY v",
      "JOIN (SELECT DISTINCT", "HAVING").foreach { op =>
      assert(all.contains(op), s"population never generated $op")
    }
    // every query shape appears (scalar / grouped-on-double / join-on-double)
    assert(sqls.exists(q => !q.contains("GROUP BY")), "no scalar query")
    assert(sqls.exists(_.contains("GROUP BY v")), "no group-on-double query")
    assert(sqls.exists(_.contains("ON a.v = b.v")), "no join-on-double query")
  }

  test("encoder discipline: no raw double output, no division, every output BIGINT-typed") {
    for (q <- FloatFuzz.queries()) {
      val sql = q.commonSql
      // the only divisions are the quarter-grid constructors "/ 4"
      val divs = Iterator.iterate(sql.indexOf("/"))(i => sql.indexOf("/", i + 1))
        .takeWhile(_ >= 0).toList
      divs.foreach { i =>
        assert(sql.substring(i, math.min(i + 3, sql.length)).startsWith("/ 4"),
          s"a non-constructor division slipped in at $i: $sql")
      }
      // every output column is either the sentinel encoder's CASE or a
      // CAST(... AS BIGINT) aggregate — never a bare double
      q.outCols.foreach { c =>
        val site = sql.indexOf(s" AS $c")
        assert(site > 0, s"output $c missing: $sql")
        val before = sql.substring(0, site)
        assert(before.endsWith("END)") || before.endsWith("AS BIGINT)"),
          s"output $c is not encoder- or BIGINT-terminated: $sql")
      }
    }
  }

  test(s"property: all ${FloatFuzz.NQueries} float queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = FloatFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = FloatFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == FloatFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > FloatFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > FloatFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
