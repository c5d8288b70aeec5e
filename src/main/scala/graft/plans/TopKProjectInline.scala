package graft.plans

import org.apache.spark.sql.catalyst.expressions.AliasHelper
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Restores the bounded-heap top-k plan for CSE-split projections —
  * the planner cliff q_fz18 surfaced (LimitFuzzSpec pins the shape).
  *
  * Spark plans `ORDER BY … LIMIT k` as `TakeOrderedAndProject`
  * (per-partition k-row heaps merged at the driver — O(k) memory at
  * any corpus size) via the `SpecialLimits` strategy, which matches at
  * most ONE Project between the Limit and the global Sort. But the
  * optimizer's common-subexpression With rewrite splits a projection
  * that shares a subexpression with itself into TWO stacked Projects
  * (the lower one materializing `_common_expr_*` columns) — e.g. the
  * DataFrame spelling `orderBy(nullif(k)).select(…, nullif(k))
  * .limit(n)`. The match then fails and the SAME query silently plans
  * a global range-partition Sort + CollectLimit: a full-table
  * exchange to select n rows — the difference between O(k) and
  * O(corpus) at 100 TB.
  *
  * This rule re-inlines the split: under a Limit, a
  * `Project(p1, Project(p2, Sort(global)))` pair collapses to one
  * `Project(inline(p1∘p2), Sort)` — exactly the shape SpecialLimits
  * accepts. Inlining duplicates the common subexpression (undoing the
  * CSE), which trades a few scalar re-evaluations per row against
  * eliminating a full-table exchange — profitable by orders of
  * magnitude whenever the Limit is small, and never worse than the
  * pre-CSE query the user wrote.
  *
  * Fires only when provably value-preserving: every expression in the
  * lower projection must be DETERMINISTIC (inlining a
  * non-deterministic alias referenced more than once would change
  * semantics — those stay split). Runs in the user-provided-rules
  * batch (fixed point), so a triple split collapses pairwise.
  *
  * Injected by [[graft.GraftExtensions]] and [[graft.GraftSession]]
  * alongside [[TailFrameRewrite]]. */
object TopKProjectInline extends Rule[LogicalPlan] with AliasHelper {

  /** Escape hatch (default on). */
  val ConfKey = "spark.graft.inlineTopKProjects"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case gl @ GlobalLimit(_, ll @ LocalLimit(_,
        Project(p1, pr2 @ Project(p2, s: Sort))))
        if s.global && p2.forall(_.deterministic) =>
      val aliasMap = getAliasMap(pr2)
      val inlined = p1.map(ne => replaceAliasButKeepName(ne, aliasMap))
      gl.copy(child = ll.copy(child = Project(inlined, s)))
  }
}
