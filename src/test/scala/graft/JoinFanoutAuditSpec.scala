package graft

import graft.plans.JoinFanoutAudit
import org.apache.spark.sql.DataFrame

/** The runtime equi-join fanout audit (graft.plans.JoinFanoutAudit)
  * under the planted-hazard discipline: the control that MUST trip is
  * the fz28 first cut itself — a join keyed on a 3-distinct-value
  * column (o_orderstatus), the ~10⁹-row-at-sf0.1 near-cartesian that
  * round 13 caught only by a human reading the self-bench. A clean
  * PK/FK join, the traversal's cardinality reads (through AQE stages,
  * codegen and broadcast exchanges), and the bench's listener path are
  * pinned alongside. */
class JoinFanoutAuditSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private def customer = spark.read.parquet(s"$sf0001/customer.parquet")

  private def materialize(df: DataFrame): DataFrame = {
    // a noop write (or .count()) plans a NEW QueryExecution and would
    // leave THIS df's executedPlan metrics untouched — toRdd executes
    // the exact plan instance the audit then reads
    df.queryExecution.toRdd.count()
    df
  }

  test("planted fz28 first-cut key (3-value equi-join) trips the audit") {
    import spark.implicits._
    val a = orders.select($"o_orderkey".as("ka"), $"o_orderstatus".as("va"))
    val b = orders.select($"o_orderkey".as("kb"), $"o_orderstatus".as("vb"))
    val j = materialize(a.join(b, $"va" === $"vb"))
    val bad = JoinFanoutAudit.violations(j)
    assert(bad.nonEmpty, "the near-cartesian control must trip the default bounds")
    val f = bad.head
    // sf0.001 ground truth: Σ nᵢ² = 750,294 over max input 1,500
    assert(f.outputRows == 750294L, f.render)
    assert(f.maxInputRows == 1500L, f.render)
    assert(f.ratio > JoinFanoutAudit.DefaultRatioBound, f.render)
  }

  test("PK/FK join is clean even with the absolute-rows floor removed") {
    import spark.implicits._
    val j = materialize(orders.join(customer,
      $"o_custkey" === $"c_custkey"))
    assert(JoinFanoutAudit.violations(j, minRows = 1L).isEmpty,
      JoinFanoutAudit.fanouts(j).map(_.render).mkString("; "))
  }

  test("traversal reads true cardinalities through AQE/broadcast/codegen") {
    import spark.implicits._
    val j = materialize(orders.join(customer,
      $"o_custkey" === $"c_custkey"))
    val fs = JoinFanoutAudit.fanouts(j)
    assert(fs.size == 1, fs.map(_.render).mkString("; "))
    // every order has a customer: output == orders rows; the bigger
    // input is the orders side itself
    assert(fs.head.outputRows == 1500L, fs.head.render)
    assert(fs.head.maxInputRows == 1500L, fs.head.render)
  }

  test("tiny deliberate products stay under the absolute-rows floor") {
    import spark.implicits._
    // a dim×dim-style product through a 1-value key (fanout = the
    // smaller side): 300×300 = 90k rows at ratio 300 — over the ratio
    // bound, under the absolute floor — exactly what DefaultMinRows
    // exists for
    // (lit(1) keys would constant-fold into a cross join and leave
    // the equi-join audit's scope — derive the 1-value key from data)
    val a = orders.limit(300).select(($"o_orderkey" % 1).as("ja"), $"o_orderkey")
    val b = orders.limit(300).select(($"o_orderkey" % 1).as("jb"), $"o_orderkey".as("ok2"))
    val j = materialize(a.join(b, $"ja" === $"jb"))
    val fs = JoinFanoutAudit.fanouts(j)
    assert(fs.exists(f => f.ratio > JoinFanoutAudit.DefaultRatioBound &&
      f.outputRows == 90000L), fs.map(_.render).mkString("; "))
    assert(JoinFanoutAudit.violations(j).isEmpty,
      "90k rows sits under the 100k floor by design")
  }

  test("listener catches a violation inside an inner spark.sql execution") {
    // the fz28 lesson: the blowup lived inside a fuzz harness's inner
    // spark.sql call, invisible to any audit of the gate's outer
    // frame — the session listener must see it (the unified
    // CardinalityAudit listener carries this object as its join arm)
    val l = new graft.plans.CardinalityAudit.Listener()
    spark.listenerManager.register(l)
    try {
      l.gate = "planted_control"
      orders.createOrReplaceTempView("__fanout_probe_orders")
      spark.sql(
        """SELECT count(*) AS n FROM
          |(SELECT o_orderkey k, o_orderstatus v FROM __fanout_probe_orders) a
          |JOIN
          |(SELECT o_orderkey k, o_orderstatus v FROM __fanout_probe_orders) b
          |ON a.v = b.v""".stripMargin).collect()
      // listener callbacks are asynchronous — poll with a bounded wait
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (l.snapshot.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val snap = l.snapshot
      assert(snap.nonEmpty, "listener must surface the planted violation")
      assert(snap.exists(f => f._2.kind == "join" && f._2.out == 750294L),
        snap.map(_._2.render).mkString("; "))
    } finally spark.listenerManager.unregister(l)
  }

  test("library join-family gates are fanout-clean at a reduced floor") {
    // the gate corpus at sf0.1 is audited by every bench run (the
    // primary wire); this sweep pins the non-fuzz join families at
    // sf0.001 with the floor low enough to measure their real ratios
    val sweep = Seq("q_j1_join_multiway", "q_j2_join_left_enrich",
      "q_j9_join_on_expr", "q_j12_coalescing_join", "q_j13_fuzzy_blocked",
      "q_dd2_minhash_lsh", "q_dd7_incremental_lsh", "q_rj1_range_join",
      "q_ev3_asof_last_signup")
      .filter(SparkEntry.queries.contains)
    assert(sweep.size >= 7, s"sweep list drifted: $sweep")
    for (name <- sweep) {
      val df = materialize(SparkEntry.queries(name)(spark, sf0001))
      val bad = JoinFanoutAudit.violations(df, minRows = 1000L)
      assert(bad.isEmpty, s"$name: ${bad.map(_.render).mkString("; ")}")
    }
  }
}
