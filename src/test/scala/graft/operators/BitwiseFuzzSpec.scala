package graft.operators

import graft.SparkSpec

/** The bitwise/FILTER fuzz in-JVM half: rule-family invariance plus
  * the population pins, including the probed dialect guards (xor
  * split, bounded shift counts). */
class BitwiseFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = BitwiseFuzz.queries().map(_.sparkSql)
    assert(a == BitwiseFuzz.queries().map(_.sparkSql))
    assert(a != BitwiseFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every operator family and the dialect guards") {
    val qs = BitwiseFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      " & ", " | ", " ^ ", "(~", " << ", " >> ", "bit_count(",
      "bit_and(", "bit_or(", "bit_xor(", "bool_and(", "bool_or(",
      "FILTER (WHERE", "count(DISTINCT", "GROUP BY",
      "% 7 = 9" // the structurally-empty FILTER arm (max → NULL)
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // the xor dialect split: Spark renders ^, DuckDB must render xor()
    val xorQ = qs.filter(_.sparkSql.contains(" ^ "))
    assert(xorQ.nonEmpty && xorQ.forall(q => q.duckSql.contains("xor(")),
      "xor arms must dual-render (DuckDB ^ is POWER)")
    // shift counts stay < 64 (DuckDB errors at >= 64 where Spark
    // masks the count — the excluded divergence)
    val shift = "(?:<<|>>) (\\d+)".r
    qs.foreach { q =>
      shift.findAllMatchIn(q.sparkSql).foreach { m =>
        assert(m.group(1).toInt < 64, s"q${q.id} shift count ${m.group(1)} >= 64")
      }
    }
    // every LEFT-shift operand is masked non-negative by construction
    // (the r12 ADVICE medium: an unmasked ~-subtree or nested << makes
    // DuckDB hard-error — 'Cannot left-shift negative number' /
    // 'Overflow in left shift' — where Spark wraps silently, one
    // reseed away from killing the whole UNION ALL oracle). The mask
    // must appear in BOTH renderings; >> stays unmasked (agrees on
    // negatives).
    for (q <- qs; s <- Seq(q.sparkSql, q.duckSql)) {
      var i = s.indexOf("<<")
      while (i >= 0) {
        assert(i >= 7 && s.substring(i - 7, i) == "& 255) ",
          s"q${q.id} unmasked left shift at $i: ...${s.substring(math.max(0, i - 30), i + 6)}...")
        i = s.indexOf("<<", i + 2)
      }
    }
    assert(sql.contains("& 255) <<"), "population never generated a masked left shift")
  }

  test(s"property: all ${BitwiseFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    BitwiseFuzz.registerViews(spark, sf0001)
    for (q <- BitwiseFuzz.queries()) {
      val on = withRules(on = true)(BitwiseFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(BitwiseFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
