package graft.operators

import org.apache.spark.sql.DataFrame
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

  private def sym(edges: DataFrame, a: String, b: String): DataFrame =
    edges.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()

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
  def peel(edges: DataFrame, a: String, b: String, k: Int, rounds: Int): DataFrame = {
    val se = sym(edges, a, b).localCheckpoint()
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
      maxRounds: Int = 100): (DataFrame, Int) = {
    val se = sym(edges, a, b).localCheckpoint()
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
}
