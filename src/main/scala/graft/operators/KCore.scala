package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed round form of Montresor et al. 2013): repeatedly drop
  * every vertex whose degree among SURVIVING vertices is below k; the
  * fixpoint is the k-core — the standard "dense part" extractor for
  * graph-shaped training data (co-citation cores, interaction cores)
  * and the precursor of degeneracy ordering.
  *
  * Scale shape (the ConnectedComponents/PageRank discipline): state
  * per round is the O(V) alive-vertex set, recomputed degrees are a
  * keyed shuffle join + two-phase count against the symmetrized edge
  * list; per-round localCheckpoint truncates the exponential lineage
  * (the iterative-graph exemption — state is the derived vertex set,
  * never corpus-sized raw data). Rounds are data-dependent: ≤ the
  * longest peel cascade ([[peelUntil]] stops at the fixpoint, the
  * production form); [[peel]] runs a FIXED round count so the DuckDB
  * oracle can replay it as a materialized CTE chain.
  */
object KCore {

  private def round(symEdges: DataFrame, alive: DataFrame, k: Int): DataFrame =
    symEdges
      .join(alive.select(col("v").as("src")), Seq("src"))
      .join(alive.select(col("v").as("dst")), Seq("dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= k)
      .select(col("src").as("v"))

  private def coreDegrees(symEdges: DataFrame, alive: DataFrame): DataFrame =
    symEdges
      .join(alive.select(col("v").as("src")), Seq("src"))
      .join(alive.select(col("v").as("dst")), Seq("dst"))
      .groupBy(col("src")).agg(count(lit(1)).cast(LongType).as("core_degree"))
      .select(col("src").as("vertex"), col("core_degree"))

  /** Fixed-round peel (gate form): `rounds` peeling rounds, then the
    * surviving vertices with their within-core degrees. Equal to the
    * true k-core whenever `rounds` ≥ the cascade length. */
  def peel(edges: DataFrame, a: String, b: String, k: Int, rounds: Int,
      edgeDir: Option[String] = None): DataFrame = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    var alive = se.select(col("src").as("v")).distinct().localCheckpoint()
    for (_ <- 1 to rounds)
      alive = round(se, alive, k).localCheckpoint()
    coreDegrees(se, alive)
  }

  /** Convergence form (production): peel until the alive set stops
    * shrinking, returning (core frame, rounds run). One bounded count
    * per round steers the loop — the PageRank.ranksUntil discipline.
    * Fails loudly rather than silently truncating the cascade. */
  def peelUntil(edges: DataFrame, a: String, b: String, k: Int,
      maxRounds: Int = 100, edgeDir: Option[String] = None): (DataFrame, Int) = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    var alive = se.select(col("src").as("v")).distinct().localCheckpoint()
    var n = alive.count()
    var r = 0
    var converged = false
    while (!converged) {
      require(r < maxRounds,
        s"k-core peel did not converge within $maxRounds rounds")
      val next = round(se, alive, k).localCheckpoint()
      val m = next.count()
      r += 1
      if (m == n) converged = true
      alive = next
      n = m
    }
    (coreDegrees(se, alive), r)
  }

  // ---------------- coreness decomposition ----------------

  /** One h-index round: every vertex's estimate drops to
    * min(current, H(neighbor estimates)), where H is the h-index —
    * the largest h with ≥ h neighbors whose estimate is ≥ h
    * (max over the desc-sorted neighbor values of min(rank, value);
    * tie order among equal values cannot change it). Plan: one keyed
    * shuffle join estimates⋈edges, a PARTITIONED window (never a
    * global sort), a two-phase max agg, and a keyed join back — all
    * O(E) work per round, co-partitioned on the vertex key. */
  private def corenessRound(symEdges: DataFrame, c: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("src")).orderBy(col("__cn").desc)
    val h = symEdges
      .join(c.select(col("v").as("dst"), col("c").as("__cn")), Seq("dst"))
      .withColumn("__rn", row_number().over(w).cast(LongType))
      .groupBy(col("src")).agg(max(least(col("__rn"), col("__cn"))).as("__h"))
    c.join(h.select(col("src").as("v"), col("__h")), Seq("v"))
      .select(col("v"), least(col("c"), col("__h")).as("c"))
  }

  private def degrees(symEdges: DataFrame): DataFrame =
    symEdges.groupBy(col("src")).agg(count(lit(1)).cast(LongType).as("c"))
      .select(col("src").as("v"), col("c"))

  /** Core-number labeling for EVERY vertex (fixed-round gate form) by
    * iterated neighbor h-index (Montresor et al. 2013 distributed
    * k-core; convergence of the local-h-index iteration to coreness:
    * Lü et al. 2016): estimates start at degrees and are capped each
    * round by the h-index of the neighbors' estimates — monotone
    * non-increasing, fixpoint = the core number, so any `rounds` ≥ the
    * convergence round returns the exact decomposition (extra rounds
    * are no-ops). This is the full decomposition the single-k
    * [[peel]] gate only samples; the per-round localCheckpoint is the
    * documented iterative-graph exemption (state = the O(V) estimate
    * vector). */
  def coreness(edges: DataFrame, a: String, b: String, rounds: Int,
      edgeDir: Option[String] = None): DataFrame = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    var c = degrees(se).localCheckpoint()
    for (_ <- 1 to rounds) c = corenessRound(se, c).localCheckpoint()
    c.select(col("v").as("vertex"), col("c").as("coreness"))
  }

  /** Convergence form (production): h-index rounds until the estimate
    * vector stops changing. The estimates are monotone non-increasing
    * integers, so their SUM strictly decreases until the fixpoint —
    * one scalar agg per round steers the loop (the peelUntil
    * discipline; no O(V) driver materialization). */
  def corenessUntil(edges: DataFrame, a: String, b: String,
      maxRounds: Int = 100, edgeDir: Option[String] = None): (DataFrame, Int) = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    var c = degrees(se).localCheckpoint()
    var sum = c.agg(org.apache.spark.sql.functions.sum(col("c"))).head().getLong(0)
    var r = 0
    var converged = false
    while (!converged) {
      require(r < maxRounds,
        s"coreness h-index iteration did not converge within $maxRounds rounds")
      val next = corenessRound(se, c).localCheckpoint()
      val m = next.agg(org.apache.spark.sql.functions.sum(col("c"))).head().getLong(0)
      r += 1
      if (m == sum) converged = true
      c = next
      sum = m
    }
    (c.select(col("v").as("vertex"), col("c").as("coreness")), r)
  }

  /** The DuckDB replay of [[coreness]]'s fixed rounds as materialized
    * CTEs (the PageRank.ranksSqlCtes discipline). Expects a `sym`
    * CTE with (src, dst); exposes `c<rounds>` with (v, c). */
  def corenessSqlCtes(rounds: Int): String = {
    val init = """c0 AS MATERIALIZED (
                 |  SELECT src AS v, CAST(count(*) AS BIGINT) AS c
                 |  FROM sym GROUP BY src)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT cp.v, LEAST(cp.c, h.h) AS c
         |  FROM c${r - 1} cp JOIN (
         |    SELECT src AS v, max(LEAST(rn, c)) AS h FROM (
         |      SELECT s.src, cn.c,
         |             CAST(row_number() OVER (PARTITION BY s.src ORDER BY cn.c DESC) AS BIGINT) AS rn
         |      FROM sym s JOIN c${r - 1} cn ON cn.v = s.dst)
         |    GROUP BY src) h ON h.v = cp.v)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
