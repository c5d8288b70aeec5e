package graft.operators

import graft.SparkSpec

/** The signed-zero identity fuzz in-JVM half: the rule-ON ≡ rule-OFF
  * property over the MIXED-sign population (the property that actually
  * failed in round 12 — no cross-engine oracle exists for it, since
  * which equal-zero representative survives is engine-internal past
  * DuckDB's segment-tree threshold), the gate population's pins, and
  * the design-boundary guards (uniform zero sign per gate query, no
  * ±0.0 in key position, bounded tail partitions). */
class SignedZeroFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = SignedZeroFuzz.queries().map(_.sparkSql)
    assert(a == SignedZeroFuzz.queries().map(_.sparkSql))
    assert(a != SignedZeroFuzz.queries(seed = 9L).map(_.sparkSql))
    assert(SignedZeroFuzz.mixedQueries().map(_.sparkSql) ==
      SignedZeroFuzz.mixedQueries().map(_.sparkSql))
  }

  test("population pins every frame shape, both aggregates, and the string exit") {
    val qs = SignedZeroFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "PRECEDING AND", "FOLLOWING", // sliding
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", // the guard shape
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "min(", "max(",
      // the negative-zero planting: a BARE -0.0 literal parses as
      // DECIMAL in both engines and loses the sign — the string cast
      // is what preserves it (probed)
      "THEN CAST('-0.0' AS DOUBLE)",
      "CASE WHEN" // zeros among values
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // every query exits through the sign-showing string cast — the
    // sentinel-encoding erasure is WHY round 12's hole went unseen
    assert(qs.forall(_.sparkSql.contains(" AS STRING) AS a_0")),
      "every exit must be CAST(... AS STRING)")
    assert(qs.forall(_.duckSql.contains(" AS VARCHAR) AS a_0")))
    // GATE queries plant zeros of ONE sign each: a query mixing
    // 'THEN -0.0' and any data-signed '* 0.0' planting would re-admit
    // the engine-internal representative question the probe found
    qs.foreach { q =>
      assert(!q.sparkSql.contains(") * 0.0"),
        s"q${q.id} plants data-signed zeros in the cross-engine gate:\n${q.sparkSql}")
      val negs = "CAST\\('-0\\.0' AS DOUBLE\\)".r.findAllIn(q.sparkSql).size
      val pos = "CAST\\('0\\.0' AS DOUBLE\\)".r.findAllIn(q.sparkSql).size
      assert(negs == 0 || pos == 0, s"q${q.id} mixes zero signs")
    }
    // ±0.0 never reaches key position: Spark's NormalizeFloatingNumbers
    // canonicalizes -0.0 in PARTITION/ORDER keys where DuckDB keeps
    // the verbatim value — a real engine divergence excluded by design
    (qs ++ SignedZeroFuzz.mixedQueries()).foreach { q =>
      val over = q.sparkSql.substring(q.sparkSql.indexOf("OVER ("))
      assert(!over.substring(0, math.max(over.indexOf(")"), 40)).contains("0.0"),
        s"q${q.id} puts a double in key position:\n${q.sparkSql}")
    }
  }

  test("tail-frame arms bound their partitions (the deliberate quadratic stays trivial)") {
    // the tail arms run Spark's UNREWRITTEN quadratic frame by design
    // (the round-12 guard refuses doubles); the partition residue must
    // keep per-partition row counts ~300 at sf0.1
    val tails = (SignedZeroFuzz.queries() ++ SignedZeroFuzz.mixedQueries())
      .filter(_.sparkSql.contains("CURRENT ROW AND UNBOUNDED FOLLOWING"))
    assert(tails.nonEmpty)
    val residue = "PARTITION BY [^%]+% (\\d+)".r
    tails.foreach { q =>
      val m = residue.findFirstMatchIn(q.sparkSql)
      assert(m.isDefined, s"q${q.id} tail arm without bounded partition")
      val p = m.get.group(1).toInt
      val needed = if (q.sparkSql.contains("__fz27_orders")) 512 else 64
      assert(p == needed, s"q${q.id} partition residue $p != $needed")
      // and never lineitem: no unique key in this testdata → tied
      // ROWS frames are legitimately engine-dependent (caught live)
      assert(!q.sparkSql.contains("lineitem"), s"q${q.id} uses lineitem")
    }
  }

  test(s"property: MIXED-sign population — rule-ON ≡ rule-OFF values (the r12 property)") {
    // THE round-12 property: the rewrite must not change which signed
    // zero survives. Mixed ±0.0 has no cross-engine oracle (the
    // equal-representative choice is engine-internal — probed: DuckDB
    // flips at its segment-tree threshold), so this spec IS its gate.
    SignedZeroFuzz.registerViews(spark, sf0001)
    for (q <- SignedZeroFuzz.mixedQueries()) {
      val on = withRules(on = true)(SignedZeroFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(SignedZeroFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }

  test("property: gate population too — rule-ON ≡ rule-OFF values") {
    SignedZeroFuzz.registerViews(spark, sf0001)
    for (q <- SignedZeroFuzz.queries()) {
      val on = withRules(on = true)(SignedZeroFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(SignedZeroFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }

  test("the gate population actually surfaces negative zeros (not vacuous)") {
    // at least one gate query's output must contain the '-0.0' string —
    // otherwise the sign-showing exit gates nothing
    SignedZeroFuzz.registerViews(spark, sf0001)
    val hasNegZero = SignedZeroFuzz.queries().exists { q =>
      spark.sql(q.sparkSql).filter("a_0 = '-0.0'").limit(1).count() > 0
    }
    assert(hasNegZero, "no gate query surfaced a -0.0 result")
  }
}
