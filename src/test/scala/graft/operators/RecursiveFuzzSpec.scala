package graft.operators

import graft.SparkSpec

/** The recursive-CTE fuzz in-JVM half: rule-family invariance plus
  * the population pins, including the structural guards the live
  * probes forced (exact anchor/step types, UNION ALL only,
  * DISTINCT-over-UNION-ALL edge dedup). */
class RecursiveFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = RecursiveFuzz.queries().map(_.sparkSql)
    assert(a == RecursiveFuzz.queries().map(_.sparkSql))
    assert(a != RecursiveFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every recursion shape and the probed guards") {
    val qs = RecursiveFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "WITH RECURSIVE",
      "UNION ALL SELECT", // every recursive arm
      "floor(v / 2.0)", // hierarchy walk
      "JOIN ed ON ed.src", // graph closure
      "count(*) %", // data-seeded anchors
      "t || " // string accumulation
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // every recursive arm carries an explicit depth/step guard —
    // termination must be structural, not data-dependent
    qs.foreach { q =>
      assert(q.sparkSql.contains("WHERE n < ") || q.sparkSql.contains("WHERE d < ") ||
        q.sparkSql.contains("WHERE v > 1"),
        s"q${q.id} has no recursion bound:\n${q.sparkSql}")
    }
    // the DuckDB recursion-inlining hazard: the edge dedup must be ONE
    // DISTINCT over UNION ALL — a UNION of branches re-applies as
    // UNION ALL inside DuckDB's recursion and double-counts edges
    // produced by both rules (caught by this gate's first run)
    qs.filter(_.sparkSql.contains("JOIN ed")).foreach { q =>
      assert(q.duckSql.contains("SELECT DISTINCT src, dst FROM ("),
        s"q${q.id}: edge CTE must dedup via DISTINCT-over-UNION-ALL")
      assert(!q.duckSql.contains(") UNION SELECT"),
        s"q${q.id}: UNION-of-branches edge dedup is unsound in DuckDB recursion")
    }
    // exact-type discipline: Spark's recursive union does not coerce
    // (probed CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE INT vs BIGINT), so
    // the generator CASTs every numeric recursion column
    assert(sql.contains("CAST(0 AS BIGINT)") && sql.contains("CAST(n + 1 AS BIGINT)"),
      "anchor/step BIGINT casts missing — Spark recursion does not coerce types")
  }

  test(s"property: all ${RecursiveFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    RecursiveFuzz.registerViews(spark, sf0001)
    for (q <- RecursiveFuzz.queries()) {
      val on = withRules(on = true)(RecursiveFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(RecursiveFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
