package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AliasHelper, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Offset, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Restores the bounded-heap top-k plan for CSE-split projections —
  * the planner cliff q_fz18 surfaced (LimitFuzzSpec pins the shape).
  *
  * Spark plans `ORDER BY … LIMIT k [OFFSET m]` as
  * `TakeOrderedAndProject` (per-partition (k+m)-row heaps merged at
  * the driver — O(k+m) memory at any corpus size) via the
  * `SpecialLimits` strategy, which matches at most ONE Project
  * between the Limit and the global Sort. But the optimizer's
  * common-subexpression With rewrite splits a projection that shares
  * a subexpression with itself into TWO stacked Projects (the lower
  * one materializing `_common_expr_*` columns) — e.g. the DataFrame
  * spelling `orderBy(nullif(k)).select(…, nullif(k)).limit(n)`. The
  * match then fails and the SAME query silently plans a global
  * range-partition Sort + CollectLimit: a full-table exchange to
  * select n rows — the difference between O(k) and O(corpus) at
  * 100 TB.
  *
  * This rule re-inlines the split for both limit shapes
  * (round-12 audit: the plain `GlobalLimit(LocalLimit(…))` and the
  * offset variant `GlobalLimit(Offset(LocalLimit(…)))` both degrade;
  * `TakeOrderedAndProject` carries the offset natively in Spark 4, so
  * both recover once the projects collapse). A STANDALONE `OFFSET m`
  * with no LIMIT is not a top-k at all — every row after the skip
  * survives, so a global sort is the only physical plan and there is
  * nothing to restore (plan pinned in LimitFuzzSpec). Under a
  * matched Limit, a `Project(p1, Project(p2, Sort(global)))` pair
  * collapses to one `Project(inline(p1∘p2), Sort)` — exactly the
  * shape SpecialLimits accepts. Inlining duplicates the common
  * subexpression (undoing the CSE), which trades a few scalar
  * re-evaluations per row against eliminating a full-table exchange —
  * profitable by orders of magnitude whenever the Limit is small, and
  * never worse than the pre-CSE query the user wrote.
  *
  * ANSI note: restoring `TakeOrderedAndProject` can change WHICH
  * rows' projection expressions are evaluated (the bounded-heap plan
  * projects only the final winners; a global-sort plan pulls skipped
  * OFFSET rows through the projection). SQL does not pin select-list
  * evaluation for rows outside the result, and vanilla Spark already
  * varies this across its own `topKSortFallbackThreshold` — the rule
  * stays inside Spark's existing contract envelope, and the inlined
  * expressions are CSE-extracted scalars the user's original query
  * evaluated for every row anyway.
  *
  * Fires only when provably value-preserving AND on the shape it
  * targets: every expression in the lower projection must be
  * DETERMINISTIC (inlining a non-deterministic alias referenced more
  * than once would change semantics — those stay split), and the
  * lower projection must contain at least one `_common_expr_*` alias
  * (the CSE rewrite's marker). The marker gate keeps the rule off
  * stacked pairs that CollapseProject DELIBERATELY left split — an
  * upper projection referencing a non-cheap user alias many times —
  * where inlining would re-evaluate the expensive expression per
  * reference if the plan later falls back past the topK threshold.
  * Runs in the user-provided-rules batch (fixed point), so a triple
  * split collapses pairwise.
  *
  * Injected by [[graft.GraftExtensions]] and [[graft.GraftSession]]
  * alongside [[TailFrameRewrite]]. */
object TopKProjectInline extends Rule[LogicalPlan] with AliasHelper {

  /** Escape hatch (default on). */
  val ConfKey = "spark.graft.inlineTopKProjects"

  /** The prefix Spark's `RewriteWithExpression` gives materialized
    * common-subexpression columns — the marker of the CSE-split shape
    * this rule exists for. */
  private val CseAliasPrefix = "_common_expr_"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else rewrite(plan)

  private def inlinable(p2: Seq[NamedExpression]): Boolean =
    p2.forall(_.deterministic) && p2.exists(_.name.startsWith(CseAliasPrefix))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case gl @ GlobalLimit(_, ll @ LocalLimit(_,
        Project(p1, pr2 @ Project(p2, s: Sort))))
        if s.global && inlinable(p2) =>
      gl.copy(child = ll.copy(child = inlineOne(p1, pr2, s)))
    case gl @ GlobalLimit(_, off @ Offset(_, ll @ LocalLimit(_,
        Project(p1, pr2 @ Project(p2, s: Sort)))))
        if s.global && inlinable(p2) =>
      gl.copy(child = off.copy(child =
        ll.copy(child = inlineOne(p1, pr2, s))))
  }

  private def inlineOne(p1: Seq[NamedExpression], pr2: Project,
      s: Sort): Project = {
    val aliasMap = getAliasMap(pr2)
    Project(p1.map(ne => replaceAliasButKeepName(ne, aliasMap)), s)
  }
}
