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
  * localCheckpoints (truncated lineage, same as ConnectedComponents);
  * rounds are a fixed small count here — production convergence loops
  * read the same code with a delta check.
  */
object PageRank {

  val Scale = 1000000000000L // 10^12: N·Scale·85 stays far inside BIGINT

  /** Directed edges (srcCol, dstCol) → (vertex, rank) after `iters`
    * rounds, damping 0.85. Vertices = all edge endpoints; dangling
    * vertices (no out-edges) contribute nothing (the standard
    * simplification, matched by the oracle). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, "unrolled-oracle range")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
    var r = verts.select(col("v"), lit(Scale).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = r.join(outDeg, r("v") === outDeg("src"))
        .select(col("src"), expr("rank div out").as("c"))
        .join(e, "src")
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = verts
        .join(contrib, verts("v") === contrib("dst"), "left")
        .select(col("v"),
          (lit(15L * Scale / 100L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    r
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
