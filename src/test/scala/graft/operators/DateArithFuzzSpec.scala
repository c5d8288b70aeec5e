package graft.operators

import graft.SparkSpec

/** The date-arithmetic-fuzz in-JVM half: the DataFrame rendering must
  * equal the Spark-SQL rendering of the same AST for every generated
  * query, so the cross-engine gate (q_fz10, which runs the DuckDB
  * rendering) isolates Spark-vs-DuckDB date semantics, never DF-vs-SQL
  * drift. Structural lints pin the dual-rendering disciplines. */
class DateArithFuzzSpec extends SparkSpec {

  test("same seed generates the identical date population") {
    val a = DateArithFuzz.queries().map(_.sparkSql)
    assert(a == DateArithFuzz.queries().map(_.sparkSql))
    assert(a != DateArithFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises every date-op family and edge arm") {
    val qs = DateArithFuzz.queries()
    val spark_ = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    // op families on the Spark rendering
    Seq("INTERVAL", "date_add(", "last_day(", "trunc(", "make_date(",
      "greatest(", "least(", "CASE WHEN", "nullif(", "coalesce(",
      "datediff(", "year(", "month(", "BETWEEN", "GROUP BY", "HAVING",
      "count(DISTINCT").foreach { op =>
      assert(spark_.contains(op), s"population never generated $op")
    }
    // all three interval units, add and subtract
    Seq(" DAY", " MONTH", " YEAR").foreach { u =>
      assert(spark_.contains(s"+ INTERVAL") && spark_.contains(u),
        s"population never generated an interval $u arm")
    }
    assert(spark_.contains("- INTERVAL"), "no interval subtraction generated")
    // the DuckDB rendering compensates every divergence site:
    // interval nodes wrapped CAST(... AS DATE), day shifts via +,
    // trunc via date_trunc, datediff via the 'day' part form
    assert(duck.contains("AS DATE)"), "DuckDB interval nodes must CAST to DATE")
    assert(!duck.contains("date_add("), "DuckDB has no date_add — render +")
    assert(!duck.contains("trunc(") || duck.contains("date_trunc("),
      "DuckDB trunc must be date_trunc")
    assert(duck.contains("datediff('day'"), "DuckDB datediff needs the part arg")
    assert(!spark_.contains("datediff('day'"), "Spark datediff takes (end, start)")
    // every column-driven shift operand is INT-cast (DuckDB has no
    // DATE + BIGINT overload — probed)
    val shiftSites = duck.split("\\) \\+ \\(").length - 1
    if (shiftSites > 0)
      assert(duck.contains("AS INT)"), "a day-shift operand lost its INT cast")
  }

  test(s"property: all ${DateArithFuzz.NQueries} date queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = DateArithFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = DateArithFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == DateArithFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > DateArithFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > DateArithFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
