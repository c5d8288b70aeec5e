package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Automatic optimizer rewrite of Spark's O(n²) window-frame class —
  * the [[graft.operators.Frames]] reversal identity as a Catalyst
  * `Rule[LogicalPlan]`, so a plain SQL/DataFrame user hits the O(n)
  * plan without knowing the trick.
  *
  * Spark's `UnboundedFollowingWindowFunctionFrame` recomputes its
  * aggregate from scratch per row: any `ROWS/RANGE BETWEEN
  * <bounded-lo> AND UNBOUNDED FOLLOWING` frame costs O(n²) per
  * partition (measured:
  * 45.6 s for one fz4-generated query at sf0.1 vs <1 s for every other
  * frame shape; 71.5 s → 0.63 s for the manual rewrite in FramesSpec).
  * The rewrite flips the ordering EXACTLY (direction AND null
  * placement: `ASC NULLS FIRST ↔ DESC NULLS LAST`) and replaces the
  * frame with the running `UNBOUNDED PRECEDING .. k FOLLOWING` twin —
  * Spark's incremental processor.
  *
  * Fires only when provably value-preserving:
  *
  *  - every window expression in the node has the hazard frame (a
  *    node mixes frames over ONE sort order — reversing it must not
  *    disturb a sibling frame);
  *  - the aggregate is order-insensitive: min/max/count over any
  *    type, sum/avg over EXACT types only (integral/decimal —
  *    floating-point accumulation is order-dependent, so a
  *    double-typed sum is NOT rewritten: bitwise-different results
  *    would be a silent semantics change);
  *  - the node has an explicit ordering to reverse.
  *
  * Ties: like every ROWS frame, ROWS results are only well-defined
  * under a total ordering (the fz1/fz4 unique-key discipline); with
  * ties both orientations are legitimately tie-dependent. RANGE
  * frames are tie-insensitive (peers enter by value), so their
  * rewrite is unconditional on ordering uniqueness.
  *
  * Injected by [[graft.GraftExtensions]] (config path) and
  * [[graft.GraftSession]] (programmatic path). Idempotent: the
  * rewritten frame's lower bound is UnboundedPreceding, which the
  * matcher rejects.
  */
object TailFrameRewrite extends Rule[LogicalPlan] {

  /** asc_nulls_first ↔ desc_nulls_last; asc_nulls_last ↔
    * desc_nulls_first. */
  private def reversedSort(so: SortOrder): SortOrder = {
    val dir = so.direction match {
      case Ascending => Descending
      case Descending => Ascending
    }
    val nulls = so.nullOrdering match {
      case NullsFirst => NullsLast
      case NullsLast => NullsFirst
    }
    SortOrder(so.child, dir, nulls, Nil)
  }

  /** Order-insensitive aggregate whose VALUE survives reversal:
    * min/max/count always; sum/avg only over exact arithmetic. */
  private def orderInsensitive(e: Expression): Boolean = e match {
    case ae: AggregateExpression => ae.aggregateFunction match {
      case _: Min | _: Max | _: Count => true
      case s: Sum => exact(s.child)
      case a: Average => exact(a.child)
      case _ => false
    }
    case _ => false
  }

  private def exact(child: Expression): Boolean = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType => true
    case _ => false
  }

  /** The hazard: ROWS *or* RANGE, bounded lower, UNBOUNDED FOLLOWING
    * upper — both frame types run on the quadratic
    * UnboundedFollowingWindowFunctionFrame. Returns (frameType,
    * rewritten UPPER bound): k PRECEDING → k FOLLOWING (literal
    * negation — exact for every numeric type incl. float sign flips),
    * CURRENT ROW → CURRENT ROW. RANGE is actually the SAFER case:
    * value bounds are tie-insensitive, and the reversal identity was
    * verified to hold for NULL order keys too (null rows are peers
    * whose frame is orientation-invariant — probed, both
    * orientations). Interval bounds (date/timestamp keys) are left
    * alone. */
  private def rewrittenUpper(f: Expression): Option[(FrameType, Expression)] = f match {
    case SpecifiedWindowFrame(ft, lower, UnboundedFollowing) =>
      val upper = lower match {
        case CurrentRow => Some(CurrentRow)
        case Literal(v: Int, t) if v < 0 => Some(Literal.create(-v, t))
        case Literal(v: Long, t) if v < 0L => Some(Literal.create(-v, t))
        case Literal(v: Short, t) if v < 0 => Some(Literal.create((-v).toShort, t))
        case Literal(v: Byte, t) if v < 0 => Some(Literal.create((-v).toByte, t))
        case Literal(v: Double, t) if v < 0d => Some(Literal.create(-v, t))
        case Literal(v: Float, t) if v < 0f => Some(Literal.create(-v, t))
        case Literal(v: Decimal, t) if v.toBigDecimal.signum < 0 =>
          Some(Literal.create(v.unary_-, t))
        case _ => None // UnboundedPreceding (already running) / FOLLOWING lowers
      }
      upper.map(u => (ft, u))
    case _ => None
  }

  /** Escape hatch (default on): set to "false" to observe/compare the
    * unrewritten quadratic plan. */
  val ConfKey = "spark.graft.rewriteTailFrames"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(wes, part, order, child, hint)
        if order.nonEmpty && wes.nonEmpty =>
      val rewritten: Seq[Option[NamedExpression]] = wes.map {
        case a @ Alias(we @ WindowExpression(fn, spec: WindowSpecDefinition), name)
            if orderInsensitive(fn) =>
          rewrittenUpper(spec.frameSpecification).map { case (ft, upper) =>
            val newSpec = spec.copy(
              orderSpec = spec.orderSpec.map(reversedSort),
              frameSpecification =
                SpecifiedWindowFrame(ft, UnboundedPreceding, upper))
            Alias(we.copy(windowSpec = newSpec), name)(
              a.exprId, a.qualifier, a.explicitMetadata, a.nonInheritableMetadataKeys)
          }
        case _ => None
      }
      if (rewritten.forall(_.isDefined))
        Window(rewritten.flatten, part, order.map(reversedSort), child, hint)
      else w
  }
}
