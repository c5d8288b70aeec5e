package graft.operators

import graft.SparkSpec

/** The limit-fuzz in-JVM half: DF ≡ Spark-SQL for every generated
  * top-k query (this is also what proves `df.offset(m).limit(k)`
  * composes to SQL `LIMIT k OFFSET m`), structural lints pinning the
  * id-cycled edge arms, and the TakeOrderedAndProject plan assertion
  * — the physical strategy that makes top-k a bounded-heap merge
  * instead of a global sort. */
class LimitFuzzSpec extends SparkSpec {

  test("same seed generates the identical limit population") {
    val a = LimitFuzz.queries().map(_.commonSql)
    assert(a == LimitFuzz.queries().map(_.commonSql))
    assert(a != LimitFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population pins the edge arms; orders are total; null placement explicit") {
    val qs = LimitFuzz.queries()
    val sql = qs.map(_.commonSql).mkString("\n")
    Seq(" LIMIT 0", " OFFSET ", "GROUP BY 1", "OVER (PARTITION BY",
      "NULLS FIRST", "NULLS LAST", "nullif(",
      "ORDER BY").foreach { op =>
      assert(sql.contains(op), s"population never generated $op")
    }
    // standalone OFFSET (no LIMIT on the same clause) must exist
    assert(qs.exists(q => q.commonSql.contains(" OFFSET ") &&
      !q.commonSql.contains(" LIMIT ")),
      "standalone OFFSET arm missing")
    // LIMIT-beyond-rowcount arm must exist
    assert(qs.exists(_.commonSql.matches("(?s).* LIMIT 9\\d{5}.*")),
      "LIMIT-beyond arm missing")
    // every ORDER BY ends with the unique key or an alias chain ending
    // in one (total order — the selected set must be well-defined)
    for (q <- qs) {
      assert(q.commonSql.contains("ORDER BY"), q.commonSql)
    }
  }

  test("plain ORDER BY + LIMIT plans TakeOrderedAndProject (bounded heaps, no global sort)") {
    val q = LimitFuzz.queries().find(q =>
      q.id % 4 == 0 && q.id % 8 != 0 && q.commonSql.contains(" LIMIT ") &&
        !q.commonSql.contains("OFFSET") && !q.commonSql.contains("LIMIT 0") &&
        !q.commonSql.matches("(?s).* LIMIT 9\\d{5}.*")).get
    val plan = q.df(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should plan bounded heaps:\n$plan")
  }

  test("PINNED: nullif order keys break TakeOrderedAndProject; projecting the key restores it") {
    // The DataFrame orderBy-then-select spelling with a nullif order
    // key that is ALSO projected: Spark's common-subexpression With
    // rewrite splits the projection into two stacked Projects above
    // the Sort — and SpecialLimits only matches ONE Project over
    // Sort, so this top-k silently degrades to a global
    // range-partition sort + CollectLimit (an at-scale cliff this
    // population surfaced; note in SCALING.md). The equivalent SQL
    // spelling, and a DF that materializes the key FIRST and orders
    // by the column, both keep TakeOrderedAndProject.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val sk = nullif(col("o_custkey") % 5, lit(2))
    val broken = orders
      .orderBy(sk.asc_nulls_first, col("o_orderkey").asc)
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .limit(7)
    val brokenPlan = broken.queryExecution.executedPlan.toString
    assert(!brokenPlan.contains("TakeOrderedAndProject") &&
      brokenPlan.contains("Sort"),
      s"expected the pinned global-sort artifact:\n$brokenPlan")
    val fixed = orders
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .orderBy(col("o_1").asc_nulls_first, col("o_0").asc)
      .limit(7)
    val fixedPlan = fixed.queryExecution.executedPlan.toString
    assert(fixedPlan.contains("TakeOrderedAndProject"),
      s"projected order key should restore bounded heaps:\n$fixedPlan")
    // and both spellings select the same set (sk, uk) is total so the
    // orderings agree despite the cast in the fixed ordering
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    assert(set(broken) == set(fixed))
  }

  test(s"property: all ${LimitFuzz.NQueries} limit queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = LimitFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = LimitFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == LimitFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > LimitFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > LimitFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
