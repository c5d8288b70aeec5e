package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank (Brin & Page 1998) — the third member of the
  * graph family (components cc1/cc2, triangles cc3). Ranks are scaled
  * BIGINTs (Scale = 10^12) and every step is floor division, so the
  * whole iteration is bit-reproducible in any engine — the same
  * discipline that lets the k-means and BPE training chains gate: the
  * oracle replays each round as a CTE.
  *
  *   r_0(v)    = Scale
  *   r_{k+1}(v) = floor(0.15·Scale) + floor(85 · Σ_{u→v} floor(r_k(u)/out(u)) / 100)
  *
  * Scale shape: ranks live in a (vertex, rank) frame; one round = one
  * join on the edge src + one aggregate on dst — both shuffles keyed
  * by vertex id, the textbook distributed PR plan. Each round
  * localCheckpoints (truncated lineage, same as ConnectedComponents).
  * [[ranks]] runs a fixed unrolled count (the oracle-gateable form);
  * [[ranksUntil]] is the production convergence loop — same round
  * kernel, iterated to a movement bound with a fail-loud guard.
  */
object PageRank {

  val Scale = 1000000000000L // 10^12: N·Scale·85 stays far inside BIGINT

  /** Normalized graph frames shared by both iteration modes. */
  private final case class Graph(e: DataFrame, verts: DataFrame, outDeg: DataFrame)

  private def graphOf(edges: DataFrame, srcCol: String, dstCol: String,
      edgeDir: Option[String] = None): Graph = {
    // the O(E) static operand follows the GraphEdges pin policy:
    // localCheckpoint at test scale, TableIO materialize-once for
    // multi-hour production runs (resumable, no pinned blocks)
    val e = GraphEdges.pin(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct(), edgeDir)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    Graph(e, verts, e.groupBy(col("src")).agg(count(lit(1)).as("out")))
  }

  /** One PR round: contribution join + dst aggregate + damped update —
    * both shuffles keyed by vertex id. Shared by the unrolled and the
    * convergence modes, so the two cannot drift. */
  private def roundStep(g: Graph, r: DataFrame): DataFrame =
    g.verts
      .join(r.join(g.outDeg, r("v") === g.outDeg("src"))
          .select(col("src"), expr("rank div out").as("c"))
          .join(g.e, "src")
          .groupBy(col("dst")).agg(sum(col("c")).as("s")),
        g.verts("v") === col("dst"), "left")
      .select(col("v"),
        (lit(15L * Scale / 100L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      .localCheckpoint()

  /** Directed edges (srcCol, dstCol) → (vertex, rank) after `iters`
    * rounds, damping 0.85. Vertices = all edge endpoints; dangling
    * vertices (no out-edges) contribute nothing (the standard
    * simplification, matched by the oracle). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      edgeDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 20, "unrolled-oracle range")
    val g = graphOf(edges, srcCol, dstCol, edgeDir)
    var r = g.verts.select(col("v"), lit(Scale).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) r = roundStep(g, r)
    r
  }

  /** Convergence-mode PageRank — the production loop: iterate the same
    * round kernel until the largest per-vertex rank movement is ≤
    * `delta` (scaled units; 0 = exact fixed point, which floor
    * arithmetic does reach), throwing after `maxIters` like
    * [[ConnectedComponents]] — a non-converged rank table silently
    * misranks, so failing loud is the only safe default. The per-round
    * delta check is one vertex-keyed join + max — the same shuffle key
    * as the round itself, nothing new materializes. */
  def ranksUntil(edges: DataFrame, srcCol: String, dstCol: String,
      delta: Long = Scale / 1000L, maxIters: Int = 60): DataFrame =
    ranksUntilCounted(edges, srcCol, dstCol, delta, maxIters)._1

  /** [[ranksUntil]] plus the round count it took — the spec uses the
    * count to pin convergence mode against the unrolled form round-
    * for-round. Damping contracts movement by ~0.85/round, so expect
    * ~log(Scale/delta)/log(1/0.85) rounds (≈ 43 at the default delta;
    * delta = 0 needs ~170 — raise maxIters deliberately for that). */
  private[operators] def ranksUntilCounted(edges: DataFrame, srcCol: String,
      dstCol: String, delta: Long, maxIters: Int): (DataFrame, Int) = {
    require(delta >= 0L, "delta is an absolute scaled-rank movement")
    val g = graphOf(edges, srcCol, dstCol)
    var r = g.verts.select(col("v"), lit(Scale).as("rank")).localCheckpoint()
    var iter = 0
    while (iter < maxIters) {
      val next = roundStep(g, r)
      val row = next.as("n").join(r.as("p"), col("n.v") === col("p.v"))
        .agg(max(abs(col("n.rank") - col("p.rank")))).head()
      val moved = if (row.isNullAt(0)) 0L else row.getLong(0) // empty graph: fixed
      r = next
      iter += 1
      if (moved <= delta) return (r, iter)
    }
    throw new IllegalStateException(
      s"PageRank did not converge to delta ≤ $delta in $maxIters rounds")
  }

  // ---------------- personalized PageRank (TrustRank) ----------------

  /** Seed-restart base: floor(0.15·Scale) on seed vertices, 0
    * elsewhere — the personalization vector in the same scaled-integer
    * discipline as [[ranks]]. */
  private def seedBase(g: Graph, seeds: DataFrame): DataFrame =
    g.verts.join(seeds.toDF("v").withColumn("__seed", lit(1)), Seq("v"), "left")
      .select(col("v"),
        when(col("__seed").isNotNull, lit(15L * Scale / 100L))
          .otherwise(lit(0L)).as("base"))
      .localCheckpoint()

  private def trustRound(g: Graph, r: DataFrame, base: DataFrame): DataFrame =
    g.verts
      .join(r.join(g.outDeg, r("v") === g.outDeg("src"))
          .select(col("src"), expr("rank div out").as("c"))
          .join(g.e, "src")
          .groupBy(col("dst")).agg(sum(col("c")).as("s")),
        g.verts("v") === col("dst"), "left")
      .join(base, Seq("v"))
      .select(col("v"),
        (col("base") + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      .localCheckpoint()

  /** Personalized PageRank with restart onto a seed set — TrustRank
    * (Gyöngyi et al. 2004), the standard propagate-quality-from-
    * trusted-seeds curation signal: rank mass enters ONLY at seeds
    * (r₀ = Scale there, 0 elsewhere; restart base likewise) and decays
    * along links, so a vertex's rank measures its link proximity to
    * the trusted set; vertices unreachable from seeds stay exactly 0.
    * Same scaled-integer floor arithmetic, round kernel and per-round
    * truncation as [[ranks]] — one more keyed broadcast-size join per
    * round for the base vector. */
  def trustRanks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, edgeDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 20, "unrolled-oracle range")
    val g = graphOf(edges, srcCol, dstCol, edgeDir)
    val base = seedBase(g, seeds)
    var r = base.select(col("v"),
        when(col("base") > 0L, lit(Scale)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) r = trustRound(g, r, base)
    r
  }

  /** Oracle twin of [[trustRanks]]: expects `e(src, dst)` and
    * `seeds(v)` CTEs; exposes `t<iters>` with (v, rank). */
  def trustRanksSqlCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""t$k AS MATERIALIZED (
        SELECT v.v,
               CAST(b.base + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank
        FROM verts v
        JOIN base b ON b.v = v.v
        LEFT JOIN (
          SELECT e.dst, CAST(sum(r.rank // d.out) AS BIGINT) AS s
          FROM t${k - 1} r
          JOIN deg d ON d.src = r.v
          JOIN e ON e.src = r.v
          GROUP BY e.dst) s ON s.dst = v.v)"""
    }
    s"""verts AS MATERIALIZED (
        SELECT DISTINCT src AS v FROM e UNION SELECT DISTINCT dst FROM e),
      deg AS MATERIALIZED (SELECT src, count(*) AS out FROM e GROUP BY src),
      base AS MATERIALIZED (
        SELECT v.v, CAST(CASE WHEN s.v IS NOT NULL THEN ${15L * Scale / 100L} ELSE 0 END AS BIGINT) AS base
        FROM verts v LEFT JOIN seeds s ON s.v = v.v),
      t0 AS (SELECT v, CAST(CASE WHEN base > 0 THEN $Scale ELSE 0 END AS BIGINT) AS rank FROM base),
      ${rounds.mkString(",\n      ")}"""
  }

  /** Oracle twin: deg/r0 plus one CTE per round (MATERIALIZED — the
    * multiply-referenced chain re-evaluates exponentially otherwise,
    * the q_bpe1 lesson). `edgesCte` must define e(src, dst). Sums and
    * the rank expression are CAST to BIGINT — DuckDB widens sum() to
    * HUGEINT, which would drift the output schema (the tx9/tx10
    * guard); N·Scale·85 ≪ 2^63 so the cast is semantics-preserving. */
  def ranksSqlCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
        SELECT v.v,
               CAST(${15L * Scale / 100L} + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank
        FROM verts v LEFT JOIN (
          SELECT e.dst, CAST(sum(r.rank // d.out) AS BIGINT) AS s
          FROM r${k - 1} r
          JOIN deg d ON d.src = r.v
          JOIN e ON e.src = r.v
          GROUP BY e.dst) s ON s.dst = v.v)"""
    }
    s"""verts AS MATERIALIZED (
        SELECT DISTINCT src AS v FROM e UNION SELECT DISTINCT dst FROM e),
      deg AS MATERIALIZED (SELECT src, count(*) AS out FROM e GROUP BY src),
      r0 AS (SELECT v, CAST($Scale AS BIGINT) AS rank FROM verts),
      ${rounds.mkString(",\n      ")}"""
  }
}
