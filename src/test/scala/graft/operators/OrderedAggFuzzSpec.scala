package graft.operators

import graft.SparkSpec

/** The ordered-aggregate fuzz in-JVM half: rule-family invariance
  * plus the population pins, centered on the tie discipline that
  * makes ordered aggregation gateable. */
class OrderedAggFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = OrderedAggFuzz.queries().map(_.sparkSql)
    assert(a == OrderedAggFuzz.queries().map(_.sparkSql))
    assert(a != OrderedAggFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every ordered shape and the tie discipline") {
    val qs = OrderedAggFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "listagg(", "WITHIN GROUP (ORDER BY",
      "percentile_disc(", "sort_array(collect_list(",
      " DESC", "GROUP BY"
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // tie discipline: a listagg must emit a function of its own order
    // key — the generator renders the emission as CAST(<order key> AS
    // STRING), so the key expression must appear in both positions
    qs.filter(_.sparkSql.contains("listagg(")).foreach { q =>
      val m = "listagg\\(CAST\\((.+?) AS STRING\\), ','\\) WITHIN GROUP \\(ORDER BY (.+?)( DESC)?\\)".r
        .findFirstMatchIn(q.sparkSql)
      assert(m.isDefined, s"q${q.id}: unexpected listagg shape")
      assert(m.get.group(1) == m.get.group(2),
        s"q${q.id}: listagg must order by the emitted expression (ties must be invisible)")
    }
    // the DuckDB renderings: WITHIN GROUP is not portable there
    qs.filter(_.sparkSql.contains("listagg(")).foreach { q =>
      assert(q.duckSql.contains("string_agg(") && q.duckSql.contains("ORDER BY"),
        s"q${q.id}: DuckDB twin must be string_agg(... ORDER BY ...)")
    }
    qs.filter(_.sparkSql.contains("sort_array")).foreach { q =>
      assert(q.duckSql.contains("ORDER BY") && q.duckSql.contains("list("),
        s"q${q.id}: DuckDB twin must be list(e ORDER BY e)")
    }
  }

  test(s"property: all ${OrderedAggFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    OrderedAggFuzz.registerViews(spark, sf0001)
    for (q <- OrderedAggFuzz.queries()) {
      val on = withRules(on = true)(OrderedAggFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(OrderedAggFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
