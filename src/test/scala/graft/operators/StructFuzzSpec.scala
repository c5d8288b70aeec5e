package graft.operators

import graft.SparkSpec

/** The struct-fuzz in-JVM half: the DataFrame rendering must equal the
  * Spark-SQL rendering of the same AST for every generated query, so
  * the cross-engine gate (q_fz15, which runs the DuckDB rendering)
  * isolates Spark-vs-DuckDB struct semantics. Structural lints pin the
  * excluded divergence classes. */
class StructFuzzSpec extends SparkSpec {

  test("same seed generates the identical struct population") {
    val a = StructFuzz.queries().map(_.sparkSql)
    assert(a == StructFuzz.queries().map(_.sparkSql))
    assert(a != StructFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises the struct surface; divergence classes never generated") {
    val qs = StructFuzz.queries()
    val spark_ = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    Seq("named_struct(", ").f0", "GROUP BY s", "count(DISTINCT named_struct",
      "min(named_struct", "max(named_struct", "'inner'", ").tag",
      "CASE WHEN").foreach { op =>
      assert(spark_.contains(op), s"population never generated $op")
    }
    assert(duck.contains("{'f0':"), "DuckDB struct-literal rendering missing")
    assert(spark_.contains(" < "), "no struct comparison generated")
    // excluded classes:
    for (q <- qs) {
      // no raw struct output: every output column is a field access
      // (".fN"/".tag" just before its alias) or a BIGINT aggregate — a
      // struct-typed column would hit the engines' different string forms
      q.outCols.foreach { c =>
        val i = q.sparkSql.indexOf(s" AS $c")
        assert(i > 0, s"output $c missing: ${q.sparkSql}")
        val before = q.sparkSql.substring(math.max(0, i - 80), i)
        assert(before.matches("(?s).*(\\)\\.(f\\d|tag|inner\\.f\\d)|AS BIGINT\\))$") ||
          before.endsWith(").f0") || before.endsWith(").f1") ||
          before.endsWith(").f2") || before.endsWith(").tag"),
          s"output $c is not field-projected or BIGINT: ...$before AS $c")
      }
      // greatest/least over structs is unsupported in DuckDB
      assert(!q.sparkSql.contains("greatest(named_struct") &&
        !q.sparkSql.contains("least(named_struct"),
        s"struct greatest/least generated: ${q.sparkSql}")
      // min/max and < operands must be null-free: every CASE-WHEN NULL
      // arm (the nullable-field constructor) must not appear inside a
      // min(/max(/comparison context
      Seq("min(named_struct", "max(named_struct").foreach { fn =>
        val i = q.sparkSql.indexOf(fn)
        if (i >= 0) {
          val frag = q.sparkSql.substring(i, math.min(q.sparkSql.length, i + 400))
          assert(!frag.takeWhile(_ != ')').contains("THEN NULL"),
            s"nullable field inside $fn: ${q.sparkSql}")
        }
      }
    }
  }

  test(s"property: all ${StructFuzz.NQueries} struct queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = StructFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = StructFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == StructFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > StructFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > StructFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
