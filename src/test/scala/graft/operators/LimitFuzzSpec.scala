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

  test("PINNED+FIXED: CSE-split top-k degrades to a global sort; TopKProjectInline restores bounded heaps") {
    // The DataFrame orderBy-then-select spelling with a nullif order
    // key that is ALSO projected: Spark's common-subexpression With
    // rewrite splits the projection into two stacked Projects — and
    // SpecialLimits only matches ONE Project over Sort, so stock
    // Spark silently degrades this top-k to a global range-partition
    // sort + CollectLimit (the at-scale cliff this population
    // surfaced; note in SCALING.md). graft's TopKProjectInline rule
    // re-inlines the split, restoring TakeOrderedAndProject.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val sk = nullif(col("o_custkey") % 5, lit(2))
    def topk = orders
      .orderBy(sk.asc_nulls_first, col("o_orderkey").asc)
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .limit(7)
    val key = graft.plans.TopKProjectInline.ConfKey
    val onPlan = topk.queryExecution.executedPlan.toString
    assert(onPlan.contains("TakeOrderedAndProject"),
      s"the inline rule should restore bounded heaps:\n$onPlan")
    val onRows = topk.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    spark.conf.set(key, "false")
    val (offPlan, offRows) = try {
      val df = topk
      (df.queryExecution.executedPlan.toString, df.collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq)
    } finally spark.conf.set(key, "true")
    // the stock-Spark artifact stays pinned behind the escape hatch
    assert(!offPlan.contains("TakeOrderedAndProject") && offPlan.contains("Sort"),
      s"expected the pinned global-sort artifact with the rule off:\n$offPlan")
    assert(onRows == offRows, "the inline rule must be value-preserving")
    // the materialize-first spelling plans bounded heaps either way
    val fixed = orders
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .orderBy(col("o_1").asc_nulls_first, col("o_0").asc)
      .limit(7)
    assert(fixed.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    assert(set(fixed) == onRows)
  }

  test("PINNED+FIXED: CSE-split LIMIT+OFFSET degrades too; the offset match restores bounded heaps") {
    // Round-12 audit of the fz18 offset arms: `df.offset(m).limit(k)`
    // optimizes to GlobalLimit(Offset(LocalLimit(…))) — a shape the
    // plain-limit match never reaches — and with the CSE-split
    // projection it planned CollectLimit over a global range-partition
    // Sort (probed rule-OFF below). TakeOrderedAndProject carries the
    // offset natively in Spark 4, so the extended rule restores the
    // bounded-heap plan for this shape as well.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val sk = nullif(col("o_custkey") % 5, lit(2))
    def topk = orders
      .orderBy(sk.asc_nulls_first, col("o_orderkey").asc)
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .offset(3).limit(7)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    val onPlan = topk.queryExecution.executedPlan.toString
    assert(onPlan.contains("TakeOrderedAndProject") && onPlan.contains("offset=3"),
      s"the offset match should restore bounded heaps:\n$onPlan")
    val onRows = rows(topk)
    val key = graft.plans.TopKProjectInline.ConfKey
    spark.conf.set(key, "false")
    val (offPlan, offRows) = try {
      val df = topk
      (df.queryExecution.executedPlan.toString, rows(df))
    } finally spark.conf.set(key, "true")
    assert(!offPlan.contains("TakeOrderedAndProject") && offPlan.contains("Sort"),
      s"expected the pinned global-sort artifact with the rule off:\n$offPlan")
    assert(onRows == offRows, "the offset-shape inline must be value-preserving")
    assert(onRows.size == 7)
  }

  test("PINNED: standalone OFFSET is inherently a global sort — nothing to restore") {
    // OFFSET with no LIMIT keeps every row after the skip, so no
    // bounded-heap physical plan exists; Spark plans CollectLimit(-1,
    // m) over the global Sort with or without the CSE split. Pinned so
    // a future Spark version changing this gets noticed.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val sk = nullif(col("o_custkey") % 5, lit(2))
    val plan = orders
      .orderBy(sk.asc_nulls_first, col("o_orderkey").asc)
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .offset(3).queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && plan.contains("Sort"),
      s"standalone OFFSET should remain the global-sort plan:\n$plan")
  }

  test("TopKProjectInline: a non-deterministic lower projection stays split") {
    // inlining a non-deterministic alias would change semantics —
    // the rule's guard must leave such plans alone. Build the
    // Project(Project(Sort)) shape from the pinned query's optimized
    // plan (rule off), then swap a lower common-expr alias child for
    // rand() and assert the rule is a no-op on it.
    import org.apache.spark.sql.catalyst.expressions.{Alias, Rand}
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Project, Sort}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val sk = nullif(col("o_custkey") % 5, lit(2))
    val key = graft.plans.TopKProjectInline.ConfKey
    spark.conf.set(key, "false")
    val split = try orders
      .orderBy(sk.asc_nulls_first, col("o_orderkey").asc)
      .select(col("o_orderkey").as("o_0"), sk.cast(LongType).as("o_1"))
      .limit(7).queryExecution.optimizedPlan
      finally spark.conf.set(key, "true")
    // sanity: the shape really is Limit over two stacked Projects
    val isSplit = split match {
      case GlobalLimit(_, LocalLimit(_, Project(_, Project(_, _: Sort)))) => true
      case _ => false
    }
    assert(isSplit, s"expected the CSE-split shape:\n$split")
    // deterministic lower projection → the rule collapses it
    val collapsed = graft.plans.TopKProjectInline(split)
    val isCollapsed = collapsed match {
      case GlobalLimit(_, LocalLimit(_, Project(_, _: Sort))) => true
      case _ => false
    }
    assert(isCollapsed, s"rule should collapse the split:\n$collapsed")
    // swap a lower alias child for rand() → the rule must not touch it
    val poisoned = split.transformUp {
      case p @ Project(list, _: Sort) =>
        p.copy(projectList = list.map {
          case a: Alias => Alias(new Rand(
            org.apache.spark.sql.catalyst.expressions.Literal(a.exprId.id % 100)),
            a.name)(a.exprId)
          case ne => ne
        })
    }
    assert(graft.plans.TopKProjectInline(poisoned) fastEquals poisoned,
      "a non-deterministic lower projection must stay split")
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
