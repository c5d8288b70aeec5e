package graft.operators

import graft.SparkSpec

/** The composed-plan fuzz in-JVM half: DF ≡ Spark-SQL for every
  * 3-level composition, structural lints pinning the guaranteed
  * surface, and the avg-over-2^53 hazard property that mechanically
  * checks [[graft.plans.TailFrameRewrite]]'s Average guard (rule ON
  * must be bitwise-identical to rule OFF, and must not have fired). */
class ComposedFuzzSpec extends SparkSpec {

  test("same seed generates the identical composed population") {
    val a = ComposedFuzz.queries().map(_.commonSql)
    assert(a == ComposedFuzz.queries().map(_.commonSql))
    assert(a != ComposedFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population composes across surfaces; both hazard directions guaranteed") {
    val qs = ComposedFuzz.queries()
    val sql = qs.map(_.commonSql).mkString("\n")
    Seq(
      "LEFT JOIN", " JOIN ", "GROUP BY GROUPING SETS", "grouping_id(",
      " IN (SELECT", "EXISTS (SELECT", "NOT EXISTS (SELECT",
      "ROWS BETWEEN 3 PRECEDING AND UNBOUNDED FOLLOWING", // hazard 1
      "ROWS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING", // hazard 2
      "RANGE BETWEEN 5 PRECEDING AND UNBOUNDED FOLLOWING",
      "UNION ALL", "EXCEPT", "INTERSECT",
      "rank() OVER", "row_number() OVER",
      "NULLS FIRST", // explicit null placement — the engines' defaults differ
      "GROUP BY g" // final aggregate over a windowed result
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // every window ORDER BY carries explicit null placement
    for (q <- qs; i <- "OVER \\(PARTITION".r.findAllMatchIn(q.commonSql).map(_.start)) {
      val frag = q.commonSql.substring(i, math.min(q.commonSql.length, i + 200))
      assert(frag.contains("NULLS FIRST"),
        s"window without explicit null placement: $frag")
    }
    // the avg-hazard variants exist for the quadratic frames
    assert(qs.count(_.avgHazardSql.isDefined) >= 10,
      "too few avg-hazard variants — the rule property would be toothless")
  }

  test(s"property: all ${ComposedFuzz.NQueries} composed queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = ComposedFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = ComposedFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == ComposedFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > ComposedFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > ComposedFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }

  test("avg-over-2^53 hazard variants: TailFrameRewrite stays inert, ON == OFF bitwise") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val variants = ComposedFuzz.queries().flatMap(q => q.avgHazardSql.map((q.id, _)))
    assert(variants.nonEmpty)
    val key = graft.plans.TailFrameRewrite.ConfKey
    for ((id, sql) <- variants) {
      val on = spark.sql(sql)
      // the rule must NOT fire on avg over an integral child
      assert(on.queryExecution.executedPlan.toString.toLowerCase
        .contains("unboundedfollowing"),
        s"q$id avg variant was rewritten — the Average guard regressed:\n$sql")
      val a = on.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(2)))).sorted.toSeq
      spark.conf.set(key, "false")
      val b = try spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) Long.MinValue
          else java.lang.Double.doubleToLongBits(r.getDouble(2)))).sorted.toSeq
        finally spark.conf.set(key, "true")
      assert(a == b, s"q$id avg-hazard variant differs rule-ON vs rule-OFF")
    }
  }
}
