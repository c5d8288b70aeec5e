package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-source BFS hop distances by frontier-free min-label rounds:
  * dist₀ = 0 on the source set; each round unions the current
  * distance table with every neighbor's distance + 1 and keeps the
  * per-vertex min. After R rounds the table holds exact min-hop
  * distances for every vertex within R hops of a source (unreached
  * vertices are absent — the natural growing-reach representation).
  *
  * This is the CC/PageRank round discipline: state is the O(reached)
  * label table, one keyed shuffle join + a two-phase min agg per
  * round, per-round localCheckpoint truncating the exponential
  * lineage (the documented iterative-graph exemption). Distances are
  * monotone non-increasing and reach only grows, so a fixed round
  * count ≥ the true eccentricity returns the exact distances — the
  * same fixed-round-vs-convergence split as KCore.
  */
object Bfs {

  private def round(symEdges: DataFrame, dist: DataFrame): DataFrame =
    dist.unionAll(
        symEdges.join(dist.withColumnRenamed("v", "dst"), Seq("dst"))
          .select(col("src").as("v"), (col("d") + 1L).as("d")))
      .groupBy(col("v")).agg(min(col("d")).as("d"))

  /** Fixed-round gate form: distances from `sources` (a one-column
    * frame of vertex ids) after `rounds` expansion rounds. */
  def hopDistances(edges: DataFrame, a: String, b: String,
      sources: DataFrame, rounds: Int, edgeDir: Option[String] = None): DataFrame = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    // sources restricted to vertices present in the graph (both sides
    // replay the same restriction)
    var dist = se.select(col("src").as("v")).distinct()
      .join(sources.toDF("v"), Seq("v"), "left_semi")
      .select(col("v"), lit(0L).cast(LongType).as("d"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      dist = round(se, dist).localCheckpoint()
    dist.select(col("v").as("vertex"), col("d").as("hops"))
  }

  /** Convergence form (production): expand until the reached set stops
    * growing AND the distance sum stops shrinking — one bounded
    * two-scalar agg per round steers the loop. */
  def hopDistancesUntil(edges: DataFrame, a: String, b: String,
      sources: DataFrame, maxRounds: Int = 100,
      edgeDir: Option[String] = None): (DataFrame, Int) = {
    val se = GraphEdges.symPinned(edges, a, b, edgeDir)
    var dist = se.select(col("src").as("v")).distinct()
      .join(sources.toDF("v"), Seq("v"), "left_semi")
      .select(col("v"), lit(0L).cast(LongType).as("d"))
      .localCheckpoint()
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(dist)
    var r = 0
    var converged = false
    while (!converged) {
      require(r < maxRounds,
        s"BFS did not converge within $maxRounds rounds")
      val next = round(se, dist).localCheckpoint()
      val nfp = fingerprint(next)
      r += 1
      if (nfp == fp) converged = true
      dist = next
      fp = nfp
    }
    (dist.select(col("v").as("vertex"), col("d").as("hops")), r)
  }

  /** DuckDB replay of [[hopDistances]]'s rounds as materialized CTEs;
    * expects `sym` (src, dst) and `srcs` (v) in scope, exposes
    * `b<rounds>` with (v, d). */
  def sqlCtes(rounds: Int): String = {
    val init = """b0 AS MATERIALIZED (
                 |  SELECT g.v, CAST(0 AS BIGINT) AS d
                 |  FROM (SELECT DISTINCT src AS v FROM sym) g
                 |  JOIN srcs s ON s.v = g.v)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""b$r AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM b${r - 1}
         |    UNION ALL
         |    SELECT e.src AS v, x.d + 1 AS d
         |    FROM sym e JOIN b${r - 1} x ON x.v = e.dst)
         |  GROUP BY v)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
