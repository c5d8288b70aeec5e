package graft.operators

import graft.{SparkSpec, Tables}

/** The timestamp-arithmetic-fuzz in-JVM half: the DataFrame rendering
  * must equal the Spark-SQL rendering of the same AST for every
  * generated query, so the cross-engine gate (q_fz12, which runs the
  * DuckDB rendering) isolates Spark-vs-DuckDB timestamp semantics.
  * The SQL view is the NORMALIZED events frame (the fz2 discipline —
  * all three engines see identical timestamps). */
class TsArithFuzzSpec extends SparkSpec {

  test("same seed generates the identical ts population") {
    val a = TsArithFuzz.queries().map(_.sparkSql)
    assert(a == TsArithFuzz.queries().map(_.sparkSql))
    assert(a != TsArithFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises every ts-op family and the µs discipline") {
    val qs = TsArithFuzz.queries()
    val spark_ = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    Seq(" INTERVAL ", "date_trunc(", "greatest(", "least(", "CASE WHEN",
      "CAST(NULL AS TIMESTAMP)", "unix_timestamp(", "count(DISTINCT",
      "GROUP BY", "HAVING", "hour(", "minute(").foreach { op =>
      assert(spark_.contains(op), s"population never generated $op")
    }
    Seq(" MINUTE", " HOUR", " DAY", " MONTH").foreach { u =>
      assert(spark_.contains(u), s"no interval $u arm")
    }
    // the divergence op dual-renders: boundary count is datediff in
    // DuckDB, truncate-then-unix-diff (or year/month recombination) in
    // Spark — and raw timestampdiff must NEVER appear (elapsed-unit
    // semantics would silently diverge)
    assert(duck.contains("datediff('"), "DuckDB boundary diffs missing")
    assert(!spark_.contains("timestampdiff("),
      "Spark rendering must not use elapsed-unit timestampdiff")
    assert(!duck.contains("unix_timestamp("), "unix_timestamp is Spark-only")
    // µs discipline: every ts-valued output column is trunc-rooted —
    // enforced by construction (OTs/AMinMax require), spot-check the
    // rendering: a bare "ts AS o_" or "ts AS a_" would be a raw
    // µs-precision output
    assert(!spark_.contains("ts AS o_") && !spark_.contains("ts AS a_"),
      "a raw ts reached an output")
  }

  test(s"property: all ${TsArithFuzz.NQueries} ts queries — DataFrame ≡ Spark-SQL") {
    Tables.events(spark, sf0001).createOrReplaceTempView("events")
    val viaDf = TsArithFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = TsArithFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == TsArithFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > TsArithFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > TsArithFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
