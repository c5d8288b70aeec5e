package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous weighted label propagation
  * (Raghavan et al. 2007, "Near linear time algorithm to detect
  * community structures in large-scale networks"), made fully
  * deterministic: every vertex starts as its own label, and each
  * round adopts the label with the LARGEST INCIDENT EDGE WEIGHT among
  * its neighbors, ties broken by smallest label — no randomized
  * visit order, so a fixed round count is a pure function of the
  * graph and replays identically in any engine (the cc1/cc8 round
  * discipline). This is the curation rung above coreness/TrustRank:
  * topic/community weighting of link neighborhoods over e.g. the
  * cc9-built co-occurrence graph.
  *
  * Scale shape per round: one keyed join of the O(E) symmetric edge
  * table against the O(V) label table, then a two-phase (src, lab)
  * weight sum and a struct-max argmax sharing ONE vertex-keyed
  * exchange. State is the O(V) label vector (per-round localCheckpoint,
  * the documented iterative-graph exemption; the O(E) operand follows
  * the [[GraphEdges.pin]] policy). Synchronous LPA can 2-cycle on
  * bipartite-ish structure, so the convergence form steers on a label
  * fingerprint and accepts either a fixpoint or a period-2 orbit —
  * both are "converged" for curation purposes (the orbit's two states
  * differ only on oscillating boundary vertices).
  */
object CommunityLpa {

  /** Weighted symmetrization: (a, b, w) one direction in → both out. */
  def sym(edges: DataFrame, a: String, b: String, w: String): DataFrame =
    edges.select(col(a).as("src"), col(b).as("dst"), col(w).as("w"))
      .unionAll(edges.select(col(b).as("src"), col(a).as("dst"), col(w).as("w")))

  /** One synchronous update. Argmax by (ws desc, lab asc) is computed
    * as `max(struct(ws, -lab))` — bit-identical to the former
    * row_number window (struct comparison is lexicographic; max of
    * `-lab` is the smallest label) but aggregation-shaped, so it
    * partial-aggregates map-side and needs no sort. The explicit
    * repartition by `src` lets BOTH aggregations reuse one exchange
    * (hash(src) clusters (src, lab) too), cutting the round from
    * 3 shuffles (join + (src,lab) agg + src window) to 2 (join +
    * src) at every scale. */
  private[operators] def round(symEdges: DataFrame, labels: DataFrame): DataFrame =
    symEdges
      .join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
      .repartition(col("src"))
      .groupBy(col("src"), col("lab")).agg(sum(col("w")).as("ws"))
      .groupBy(col("src"))
      .agg(max(struct(col("ws"), (-col("lab")).as("nl"))).as("__m"))
      .select(col("src").as("v"), (-col("__m")("nl")).as("lab"))

  private def initLabels(symEdges: DataFrame): DataFrame =
    symEdges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lab"))

  /** Fixed-round gate form: labels after `rounds` synchronous updates. */
  def communities(edges: DataFrame, a: String, b: String, w: String,
      rounds: Int, edgeDir: Option[String] = None): DataFrame = {
    val se = GraphEdges.pin(sym(edges, a, b, w), edgeDir)
    var lab = initLabels(se).localCheckpoint()
    for (_ <- 1 to rounds) lab = round(se, lab).localCheckpoint()
    lab.select(col("v").as("vertex"), col("lab").as("community"))
  }

  /** Convergence form (production): iterate until the label assignment
    * reaches a fixpoint OR a period-2 orbit (synchronous LPA's known
    * failure mode), detected by an order-free label fingerprint —
    * bit_xor of a row hash (sum would overflow under ANSI; the sp-gate
    * signature idiom). Returns (labels, rounds run). */
  def communitiesUntil(edges: DataFrame, a: String, b: String, w: String,
      maxRounds: Int = 50, edgeDir: Option[String] = None): (DataFrame, Int) = {
    val se = GraphEdges.pin(sym(edges, a, b, w), edgeDir)
    var lab = initLabels(se).localCheckpoint()
    def fp(df: DataFrame): Long =
      df.agg(coalesce(bit_xor(xxhash64(col("v"), col("lab"))), lit(0L)))
        .head().getLong(0)
    var prev = fp(lab)
    var prevPrev = 0L
    var r = 0
    var converged = false
    while (!converged) {
      require(r < maxRounds, s"LPA did not converge within $maxRounds rounds")
      val next = round(se, lab).localCheckpoint()
      val nfp = fp(next)
      r += 1
      if (nfp == prev || (r >= 2 && nfp == prevPrev)) converged = true
      lab = next
      prevPrev = prev
      prev = nfp
    }
    (lab.select(col("v").as("vertex"), col("lab").as("community")), r)
  }

  /** Oracle twin: DuckDB CTE chain expecting a `sym(src, dst, w)` CTE;
    * exposes `l<rounds>` with (v, lab). Multiply-referenced CTEs are
    * MATERIALIZED (the bpe1 exponential-inlining lesson). */
  def communitiesSqlCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""lab$i AS MATERIALIZED (
         |  SELECT e.src AS v, p.lab, CAST(sum(e.w) AS BIGINT) AS ws
         |  FROM sym e JOIN l${i - 1} p ON p.v = e.dst
         |  GROUP BY e.src, p.lab),
         |l$i AS MATERIALIZED (
         |  SELECT v, lab FROM (
         |    SELECT v, lab, row_number() OVER (PARTITION BY v ORDER BY ws DESC, lab ASC) AS rn
         |    FROM lab$i) WHERE rn = 1)""".stripMargin
    }
    (Seq("l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lab FROM sym)") ++ roundCtes)
      .mkString(",\n")
  }
}
