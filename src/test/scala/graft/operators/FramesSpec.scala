package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The O(n²)-frame rewrite: `runningForm` must equal `tailForm`
  * row-for-row on exactly the shape the fz4 generator excludes
  * (bounded-lo / UNBOUNDED FOLLOWING), across aggregates, bounds,
  * directions and null placements — and its physical plan must be the
  * incremental UnboundedPreceding frame, not the quadratic
  * UnboundedFollowing one. */
class FramesSpec extends SparkSpec {

  import Frames.Ord

  private def orders = Tables.orders(spark, sf0001)

  test("runningForm == tailForm for sum/min/max/count across bounds and orderings") {
    val part = Seq(col("o_orderstatus"))
    // unique total order (the fz4 determinism discipline), with a
    // nullable leading key to exercise null-placement reversal
    val orderings = Seq(
      Seq(Ord(col("o_custkey")), Ord(col("o_orderkey"))),
      Seq(Ord(col("o_custkey"), desc = true, nullsLast = true), Ord(col("o_orderkey"))),
      Seq(Ord(nullif(col("o_orderpriority"), lit("1-URGENT")), nullsLast = true),
        Ord(col("o_orderkey"))),
      Seq(Ord(nullif(col("o_orderpriority"), lit("1-URGENT")), desc = true),
        Ord(col("o_orderkey"), desc = true)))
    val aggs = Seq[Column => Column]((c: Column) => sum(c), (c: Column) => min(c),
      (c: Column) => max(c), (c: Column) => count(c))
    val vals = col("o_custkey") % 100
    for (ord <- orderings; lo <- Seq(-3L, 0L, -40L, 2L); (mk, ai) <- aggs.zipWithIndex) {
      val df = orders.select(col("o_orderkey"),
        Frames.tailForm(mk(vals), part, ord, lo).cast("long").as("slow"),
        Frames.runningForm(mk(vals), part, ord, lo).cast("long").as("fast"))
      val bad = df.filter(not(col("slow") <=> col("fast"))).count()
      assert(bad == 0, s"agg#$ai lo=$lo ord=${ord.map(o => (o.desc, o.nullsLast))}: $bad rows differ")
    }
  }

  test("reversal flips null placement, not just direction") {
    // a pure-direction flip would put the null block at the wrong end;
    // this ordering leads with a nullable key so any such bug shifts
    // frames for every row near the null block
    val ord = Seq(Ord(nullif(col("o_orderpriority"), lit("3-MEDIUM"))),
      Ord(col("o_orderkey")))
    val df = orders.select(
      Frames.tailForm(count(lit(1)), Seq(col("o_orderstatus")), ord, -1L)
        .cast("long").as("slow"),
      Frames.runningForm(count(lit(1)), Seq(col("o_orderstatus")), ord, -1L)
        .cast("long").as("fast"))
    assert(df.filter(not(col("slow") <=> col("fast"))).count() == 0)
    // and the naive wrong reversal (direction only) does NOT agree —
    // proving the test would catch the null-placement bug
    val wrongRev = ord.map(o => Ord(o.col, !o.desc, o.nullsLast))
    val wrong = orders.select(
      Frames.tailForm(count(lit(1)), Seq(col("o_orderstatus")), ord, -1L)
        .cast("long").as("slow"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(wrongRev.map(_.sortCol): _*)
        .rowsBetween(Long.MinValue, 1L)).cast("long").as("fast"))
    assert(wrong.filter(not(col("slow") <=> col("fast"))).count() > 0,
      "direction-only reversal should diverge on the nullable ordering")
  }

  test("plan: runningForm executes the incremental frame, tailForm the quadratic one") {
    val ord = Seq(Ord(col("o_custkey")), Ord(col("o_orderkey")))
    def physical(c: Column): String = orders.select(c.as("v"))
      .queryExecution.executedPlan.toString
    val slow = physical(Frames.tailForm(sum(col("o_custkey")), Seq(col("o_orderstatus")), ord, -3L))
    val fast = physical(Frames.runningForm(sum(col("o_custkey")), Seq(col("o_orderstatus")), ord, -3L))
    assert(slow.contains("unboundedfollowing"),
      s"tailForm should carry the UNBOUNDED FOLLOWING frame:\n$slow")
    assert(!fast.toLowerCase.contains("unboundedfollowing"),
      s"runningForm must not retain an UNBOUNDED FOLLOWING frame:\n$fast")
    assert(fast.toLowerCase.contains("unboundedpreceding"),
      s"runningForm should run the incremental growing frame:\n$fast")
  }
}
