package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Post-execution EQUI-JOIN FANOUT audit — automating the blowup class
  * that round 13 caught only by eye: fz28's first-cut RTRIM join keyed
  * 150k×75k rows on a 3–5-distinct-value string, a ~10⁹-row
  * near-cartesian intermediate that shipped to a committed bench
  * before a human read the numbers (it cost +10 s at sf0.1; at 100×
  * it is a job-killer, not a blip). The repo's PlanAuditSpec polices
  * band-join cartesians and quadratic frames STATICALLY; a
  * low-cardinality equi-key — the oldest blowup class there is — is
  * invisible in the plan shape (the join LOOKS like any hash join)
  * and only surfaces in runtime cardinalities. So this audit reads
  * them: after a plan executes, every equi-join node's
  * `numOutputRows` is compared against the larger of its inputs, and
  * a fanout `out / max(in)` above the bound with a non-trivial
  * absolute output is flagged.
  *
  * Why output/max(input) and not output/sum or selectivity: a key
  * with k distinct values over sides of size L and R produces ~L·R/k
  * rows — fanout ≈ min(L,R)/k — so the ratio directly measures
  * "rows multiplied per probe row", which is the quantity that grows
  * LINEARLY with scale for a fixed-cardinality key (the hazard) and
  * stays O(1) for PK/FK joins (ratio ≤ 1) and bounded-bucket joins
  * (ratio ≤ bucket cap). The `minRows` floor keeps deliberately tiny
  * high-fanout frames (dim×dim cross products measured in hundreds of
  * rows) out of scope: the hazard class is big AND multiplying.
  *
  * Two consumers:
  *  - [[Listener]] — a [[QueryExecutionListener]] the bench registers
  *    for its whole run, so the audit sees EVERY execution, including
  *    the fuzz harnesses' inner `spark.sql` frames where the fz28
  *    first cut actually lived (a DataFrame-level audit on the gate's
  *    outer frame sees only the collected fingerprint rows).
  *  - [[violations]] — direct post-execution audit of one frame, the
  *    spec-side surface (planted-hazard control + library sweeps).
  *
  * Scope: equi-joins only (`leftKeys.nonEmpty`), as the class
  * demands — broadcast nested-loop / cartesian nodes are either
  * deliberate bounded products (q_j7, q_d2, ANN brute-force) already
  * pinned by PlanAuditSpec, or carry no key to be low-cardinality in.
  * Joins inside uncorrelated subquery plans are not walked (none of
  * the library's subqueries join at scale; the gate corpus runs the
  * main plans). Metrics are read from the AQE-final plan, so the
  * numbers are what actually ran, reused stages included. */
object JoinFanoutAudit {

  /** One executed equi-join's cardinality record. */
  final case class Fanout(node: String, keys: String, joinType: String,
      outputRows: Long, maxInputRows: Long) {
    def ratio: Double = outputRows.toDouble / math.max(1L, maxInputRows).toDouble
    def render: String =
      f"$node($joinType on $keys): out=$outputRows maxIn=$maxInputRows fanout=$ratio%.1f"
  }

  /** Default trip line: fanout > 256 means every probe row matched
    * >256 build rows on average — no library operator does that by
    * design (PK/FK ≤ 1; LSH/shingle buckets are df-capped far below;
    * date spines fan by days-per-key, double digits). The planted
    * fz28 first-cut control sits at ~720 even at sf0.001 and grows
    * linearly with sf, so the bound separates hazard from legit with
    * an order of magnitude on each side. */
  val DefaultRatioBound: Double = 256.0

  /** Ignore joins whose absolute output stays under 100k rows: tiny
    * deliberate products (dim×dim, VALUES-list joins) can have big
    * ratios and zero scale risk — the hazard class is big AND
    * multiplying. At the bench's sf0.1 every real blowup clears this
    * floor by orders of magnitude (the fz28 first cut: ~10⁹). */
  val DefaultMinRows: Long = 100000L

  /** All executed equi-join cardinalities in the frame's final plan. */
  def fanouts(df: DataFrame): Seq[Fanout] = fromExecution(df.queryExecution)

  /** Fanout records above the (bound, floor) — empty means clean. */
  def violations(df: DataFrame, ratioBound: Double = DefaultRatioBound,
      minRows: Long = DefaultMinRows): Seq[Fanout] =
    fanouts(df).filter(f => f.outputRows >= minRows && f.ratio > ratioBound)

  def fromExecution(qe: QueryExecution): Seq[Fanout] =
    collectJoins(qe.executedPlan).flatMap { j =>
      val out = j.metrics.get("numOutputRows").map(_.value)
      val maxIn = j.children.flatMap(rowsOut(_)).reduceOption(_ max _)
      (out, maxIn) match {
        case (Some(o), Some(in)) =>
          Some(Fanout(j.nodeName, j.leftKeys.map(_.sql).mkString(", "),
            j.joinType.toString, o, in))
        case _ => None // a side with no readable row metric: skip, don't guess
      }
    }

  private def collectJoins(p: SparkPlan): Seq[BaseJoinExec] = p match {
    case a: AdaptiveSparkPlanExec => collectJoins(a.executedPlan)
    case q: QueryStageExec => collectJoins(q.plan)
    case r: ReusedExchangeExec => collectJoins(r.child)
    case j: BaseJoinExec if j.leftKeys.nonEmpty =>
      j +: j.children.flatMap(collectJoins)
    case other => other.children.flatMap(collectJoins)
  }

  /** Rows a join input produced: the nearest descendant with a row
    * metric. Exchanges report written shuffle records; wrappers
    * without a metric (InputAdapter, Project, Sort) pass through to
    * their single child. Multi-child metric-less nodes return None —
    * skipping beats guessing on a cardinality audit. */
  private def rowsOut(p: SparkPlan): Option[Long] = p match {
    case a: AdaptiveSparkPlanExec => rowsOut(a.executedPlan)
    case q: QueryStageExec => rowsOut(q.plan)
    case r: ReusedExchangeExec => rowsOut(r.child)
    case _ =>
      p.metrics.get("numOutputRows").map(_.value)
        .orElse(p.metrics.get("shuffleRecordsWritten").map(_.value))
        .orElse(if (p.children.size == 1) rowsOut(p.children.head) else None)
  }

  /** Session-wide audit hook: registered via
    * `spark.listenerManager.register(l)`, it walks every successful
    * execution's final plan and accumulates violations. Callbacks
    * arrive on the listener-bus thread ASYNCHRONOUSLY, so the `gate`
    * context tag is best-effort attribution (a violation landing in a
    * ~ms window around a gate boundary may carry the neighbour's
    * name) — the record's keys/cardinalities identify the culprit
    * regardless, and entries dedupe by content so repeated bench
    * passes don't multiply them. */
  final class Listener(ratioBound: Double = DefaultRatioBound,
      minRows: Long = DefaultMinRows) extends QueryExecutionListener {
    @volatile var gate: String = ""
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Fanout]()
    private val gates = new java.util.concurrent.ConcurrentHashMap[String, String]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      try fromExecution(qe)
        .filter(f => f.outputRows >= minRows && f.ratio > ratioBound)
        .foreach { f =>
          val key = s"${f.node}|${f.keys}|${f.outputRows}|${f.maxInputRows}"
          seen.putIfAbsent(key, f)
          gates.putIfAbsent(key, gate)
        }
      catch { case _: Exception => () } // an audit crash must never fail the run

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    /** (best-effort gate tag, record) pairs seen so far. */
    def snapshot: Seq[(String, Fanout)] = {
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.sortBy(_._1).map { case (k, f) => (gates.get(k), f) }
    }
  }
}
