package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Graph-shaped operators. The connected-components kernel
  * (dedup clustering) gates against a DuckDB RECURSIVE CTE computing
  * the same min-label closure — the one oracle shape that can check an
  * iterative Spark fixpoint exactly.
  */
object GraphQueries extends QueryModule {

  // Bipartite order–part graph: orders sharing a part merge into one
  // component (the same shape as docs sharing a near-dup pair).
  // Bounded: l_orderkey < 500 keeps ~2k edges at every SF (keys are
  // sparse in a 10×-wider range as SF grows).
  private val cc1 = Q(
    "q_cc1_components",
    "connected components via min-label propagation over an order-part bipartite graph",
    (s, d) => {
      val edges = Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey").as("a"),
          (col("l_partkey") + 1000000L).as("b"))
        .distinct()
      ConnectedComponents.components(edges, "a", "b")
        .orderBy(col("vertex"))
    },
    Some("""
      WITH RECURSIVE
      e AS (SELECT DISTINCT l_orderkey AS a, 1000000 + l_partkey AS b
            FROM lineitem WHERE l_orderkey < 500),
      sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      reach(v, label) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, r.label FROM sym s JOIN reach r ON r.v = s.b
      )
      SELECT v AS vertex, CAST(min(label) AS BIGINT) AS component
      FROM reach GROUP BY v ORDER BY vertex"""))

  // The same graph through the alternating large/small-star algorithm
  // (O(log n) rounds — the long-chain scale path); same recursive-CTE
  // oracle, so the two implementations are gate-proven equivalent.
  private val cc2 = Q(
    "q_cc2_components_star",
    "connected components via alternating large/small-star over the same graph",
    (s, d) => {
      val edges = Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey").as("a"),
          (col("l_partkey") + 1000000L).as("b"))
        .distinct()
      ConnectedComponents.componentsStar(edges, "a", "b")
        .orderBy(col("vertex"))
    },
    cc1.oracle)

  // Triangle counting over the supplier co-part graph (suppliers
  // linked when they supply the same part): degree-ordered wedges
  // (Suri & Vassilvitskii) so no vertex ever fans out O(d_max²); the
  // oracle is the semantic three-way a<b<c join — the totals must
  // agree exactly, which proves the orientation counts each triangle
  // once.
  private val cc3 = Q(
    "q_cc3_triangles",
    "degree-ordered triangle count of the supplier co-part graph",
    (s, d) => {
      // bounded slice (cc1's convention): the FULL co-part graph at
      // sf0.1 is near-complete (every supplier pairs with every other
      // through some part) — a degenerate graph where triangle count
      // approaches C(n,3) and says nothing; the order-bounded slice
      // keeps the graph sparse at every SF so the gate exercises the
      // wedge path, not a clique enumeration
      val ps = Tables.lineitem(s, d).filter(col("l_orderkey") < 500)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup")).distinct()
      val edges = ps.as("x").join(ps.as("y"), col("x.p") === col("y.p"))
        .filter(col("x.sup") < col("y.sup"))
        .select(col("x.sup").as("a"), col("y.sup").as("b")).distinct()
      Triangles.countTriangles(edges, "a", "b")
    },
    Some("""
      WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem
                  WHERE l_orderkey < 500),
      e AS (
        SELECT DISTINCT x.sup AS va, y.sup AS vb
        FROM ps x JOIN ps y ON x.p = y.p AND x.sup < y.sup),
      v AS (SELECT count(DISTINCT v) AS n_vertices FROM
              (SELECT va AS v FROM e UNION ALL SELECT vb FROM e)),
      tri AS (
        SELECT count(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.va = e1.vb
        JOIN e e3 ON e3.va = e1.va AND e3.vb = e2.vb)
      SELECT v.n_vertices, (SELECT count(*) FROM e) AS n_edges, tri.n_triangles
      FROM v CROSS JOIN tri"""))

  // Integer-exact PageRank over cc1's bounded order→part graph: five
  // rounds, every quantity a floor-divided BIGINT, the oracle replays
  // the rounds as MATERIALIZED CTEs (the KMeans/BPE unrolling
  // discipline). Orders hold all out-edges; parts are rank sinks —
  // a well-defined directed PR instance.
  private val cc4 = {
    val iters = 5
    Q(
      "q_cc4_pagerank",
      s"integer-exact PageRank, $iters unrolled rounds over the order-part graph",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey").as("src"),
            (col("l_partkey") + 1000000L).as("dst"))
          .distinct()
        PageRank.ranks(edges, "src", "dst", iters)
          .select(col("v").as("vertex"), col("rank"))
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS src, l_partkey + 1000000 AS dst
          FROM lineitem WHERE l_orderkey < 500),
        ${PageRank.ranksSqlCtes(iters)}
        SELECT v AS vertex, rank FROM r$iters ORDER BY vertex"""))
  }

  // k-core of the order–part bipartite graph (k = 2, the smallest k
  // with a real peel cascade here: at sf0.01 the peel runs 8 rounds,
  // 1711 → 761 vertices). Gate form = KCore.peel at a FIXED 10 rounds
  // so the oracle replays it as a materialized CTE chain (the cc4
  // unrolling discipline) — ≥ the cascade length at gate scale, so it
  // equals the true 2-core; production uses KCore.peelUntil
  // (spec-pinned equal at its stop round).
  private val cc5 = {
    val k = 2
    val rounds = 10
    val roundCtes = (1 to rounds).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT src AS v FROM (
         |    SELECT s.src, count(*) AS d
         |    FROM sym s JOIN a${r - 1} x ON x.v = s.src
         |               JOIN a${r - 1} y ON y.v = s.dst
         |    GROUP BY s.src)
         |  WHERE d >= $k)""".stripMargin
    }.mkString(",\n")
    Q(
      "q_cc5_kcore",
      s"$k-core by iterative peeling, $rounds unrolled rounds over the order-part graph",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey").as("a"),
            (col("l_partkey") + 1000000L).as("b"))
          .distinct()
        KCore.peel(edges, "a", "b", k, rounds)
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
          FROM lineitem WHERE l_orderkey < 500),
        sym AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
        a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym),
        $roundCtes
        SELECT s.src AS vertex, CAST(count(*) AS BIGINT) AS core_degree
        FROM sym s JOIN a$rounds x ON x.v = s.src
                   JOIN a$rounds y ON y.v = s.dst
        GROUP BY s.src ORDER BY vertex"""))
  }

  // Full coreness decomposition — the per-vertex core number the
  // single-k cc5 gate only samples (the standard graph-curation
  // density signal: keep/weight documents by the coreness of their
  // link neighborhood). Montresor h-index rounds: estimates start at
  // degrees, each round caps by the h-index of neighbor estimates;
  // monotone fixpoint = coreness, so the FIXED 10 rounds (2× the
  // measured 5-round convergence at sf0.01; extra rounds are no-ops)
  // replay exactly in DuckDB as a materialized CTE chain. Graph: the
  // order–part bipartite slice densified by folding parts mod 100
  // (coreness 1..6 at sf0.01 — a real decomposition, where the raw
  // bipartite slice is a shallow {1,2}).
  private val cc6 = {
    val rounds = 10
    Q(
      "q_cc6_coreness",
      s"core-number labeling for every vertex, $rounds unrolled h-index rounds",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 1000)
          .select(col("l_orderkey").as("a"),
            (col("l_partkey") % 100 + 1000000L).as("b"))
          .distinct()
        KCore.coreness(edges, "a", "b", rounds)
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS a, (l_partkey % 100) + 1000000 AS b
          FROM lineitem WHERE l_orderkey < 1000),
        sym AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
        ${KCore.corenessSqlCtes(rounds)}
        SELECT v AS vertex, c AS coreness FROM c$rounds ORDER BY vertex"""))
  }

  // Multi-source BFS hop distances over the order-part graph: sources
  // = the first ten orders; 8 unrolled min-label rounds (the output is
  // deterministic for ANY fixed round count — vertices beyond 8 hops
  // are simply not yet reached — and 8 covers the slice's eccentricity
  // at sf0.01). The distance-to-seed-set signal is the standard
  // crawl-frontier / link-neighborhood curation feature.
  private val cc7 = {
    val rounds = 8
    Q(
      "q_cc7_bfs_hops",
      s"multi-source BFS hop distances, $rounds unrolled min-label rounds",
      (s, d) => {
        import s.implicits._
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey").as("a"),
            (col("l_partkey") + 1000000L).as("b"))
          .distinct()
        val sources = (0L until 10L).toDF("v")
        Bfs.hopDistances(edges, "a", "b", sources, rounds)
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000 AS b
          FROM lineitem WHERE l_orderkey < 500),
        sym AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
        srcs AS (SELECT unnest(range(0, 10)) AS v),
        ${Bfs.sqlCtes(rounds)}
        SELECT v AS vertex, d AS hops FROM b$rounds ORDER BY vertex"""))
  }

  // TrustRank / personalized PageRank: rank mass enters only at the
  // ten seed orders and decays along links — the propagate-quality-
  // from-trusted-seeds curation signal (seed-proximity complement of
  // cc7's hop distances). Same scaled-integer discipline as cc4.
  private val cc8 = {
    val iters = 5
    Q(
      "q_cc8_trustrank",
      s"personalized PageRank (TrustRank) from 10 seed orders, $iters unrolled rounds",
      (s, d) => {
        import s.implicits._
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey").as("src"),
            (col("l_partkey") + 1000000L).as("dst"))
          .distinct()
        PageRank.trustRanks(edges, "src", "dst", (0L until 10L).toDF("v"), iters)
          .select(col("v").as("vertex"), col("rank"))
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS src, l_partkey + 1000000 AS dst
          FROM lineitem WHERE l_orderkey < 500),
        seeds AS (SELECT unnest(range(0, 10)) AS v),
        ${PageRank.trustRanksSqlCtes(iters)}
        SELECT v AS vertex, rank FROM t$iters ORDER BY vertex"""))
  }

  // Weighted co-occurrence graph CONSTRUCTION — how the link graphs
  // the cc-family consumes get built from transactional data
  // (market-basket / co-citation): part pairs sharing an order, edge
  // weight = number of shared orders, thresholded. Scale shape: the
  // self-join is keyed by orderkey so pair fan-out is bounded by the
  // per-order item count squared (a per-GROUP quadratic, never a
  // corpus one — the same containment argument as dd4's per-shingle
  // pairs), and the weight agg is two-phase on the (a, b) pair key.
  // The df cap (orders with > 8 distinct parts are excluded on both
  // sides) bounds the worst group, exactly dd4's hot-shingle
  // discipline.
  private val cc9 = {
    val minShared = 2
    val maxBasket = 8
    Q(
      "q_cc9_cooccurrence",
      s"co-occurrence graph build: part pairs sharing ≥ $minShared orders (baskets ≤ $maxBasket)",
      (s, d) => {
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        val small = items.groupBy(col("ok")).agg(count(lit(1)).cast(LongType).as("__n"))
          .filter(col("__n") <= maxBasket).select(col("ok"))
        val bounded = items.join(small, Seq("ok"), "left_semi")
        val a = bounded.select(col("ok"), col("pk").as("part_a"))
        val b = bounded.select(col("ok"), col("pk").as("part_b"))
        a.join(b, Seq("ok"))
          .filter(col("part_a") < col("part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).cast(LongType).as("n_shared"))
          .filter(col("n_shared") >= minShared)
          .orderBy(col("part_a"), col("part_b"))
      },
      Some(s"""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        small AS (
          SELECT ok FROM items GROUP BY ok HAVING count(*) <= $maxBasket),
        bounded AS (
          SELECT i.ok, i.pk FROM items i JOIN small s ON s.ok = i.ok)
        SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_shared
        FROM bounded a JOIN bounded b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= $minShared
        ORDER BY 1, 2"""))
  }

  // Community detection over the cc9-built co-occurrence graph:
  // 4 fixed synchronous weighted-LPA rounds (deterministic argmax,
  // ties to the smallest label). At sf0.01 this resolves ~1800
  // vertices into ~480 communities (largest ~42) — real mesoscale
  // structure, not connected components.
  private val cc10 = {
    val rounds = 4
    val minShared = 2
    val maxBasket = 8
    Q(
      "q_cc10_communities",
      s"weighted label-propagation communities on the co-occurrence graph, $rounds sync rounds",
      (s, d) => {
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        val small = items.groupBy(col("ok")).agg(count(lit(1)).cast(LongType).as("__n"))
          .filter(col("__n") <= maxBasket).select(col("ok"))
        val bounded = items.join(small, Seq("ok"), "left_semi")
        val a = bounded.select(col("ok"), col("pk").as("part_a"))
        val b = bounded.select(col("ok"), col("pk").as("part_b"))
        val edges = a.join(b, Seq("ok"))
          .filter(col("part_a") < col("part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).cast(LongType).as("w"))
          .filter(col("w") >= minShared)
        CommunityLpa.communities(edges, "part_a", "part_b", "w", rounds)
          .orderBy(col("vertex"))
      },
      Some(s"""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        small AS (
          SELECT ok FROM items GROUP BY ok HAVING count(*) <= $maxBasket),
        bounded AS (
          SELECT i.ok, i.pk FROM items i JOIN small s ON s.ok = i.ok),
        e0 AS (
          SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS w
          FROM bounded a JOIN bounded b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2 HAVING count(*) >= $minShared),
        sym AS MATERIALIZED (
          SELECT part_a AS src, part_b AS dst, w FROM e0
          UNION ALL SELECT part_b, part_a, w FROM e0),
        ${CommunityLpa.communitiesSqlCtes(rounds)}
        SELECT v AS vertex, lab AS community FROM l$rounds ORDER BY vertex"""))
  }

  override val all: Seq[Q] = Seq(cc1, cc2, cc3, cc4, cc5, cc6, cc7, cc8, cc9, cc10)
}
