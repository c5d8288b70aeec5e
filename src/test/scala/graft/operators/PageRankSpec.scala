package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: the same floor-div recurrence in plain
    * Scala over adjacency maps. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val verts = e.flatMap(t => Seq(t._1, t._2)).distinct
    val out = e.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    var r = verts.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / out(src) }.sum
      }
      r = verts.map(v =>
        v -> (15L * PageRank.Scale / 100L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("ranks equal the floor-div reference bit-for-bit") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L))
    assert(run(g, 5) == reference(g, 5))
  }

  test("a sink pointed at by everyone outranks its pointers") {
    val star = (2L to 10L).map(i => (i, 1L)) // all point to 1
    val r = run(star, 5)
    assert((2L to 10L).forall(i => r(1L) > r(i)))
    // the pointers have no in-links: their rank is the bare damping term
    assert(r(2L) == 15L * PageRank.Scale / 100L)
  }

  test("two rounds differ from one (the loop actually iterates)") {
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L))
    assert(run(g, 1) != run(g, 2))
    assert(run(g, 2) == reference(g, 2))
  }

  test("convergence mode equals the unrolled form at its stop round") {
    // both modes share roundStep; prove it end-to-end by converging to
    // a movement bound, then unrolling ranks() to exactly that many
    // rounds — the tables must match bit-for-bit (and the reference)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L), (3L, 4L))
    val (df, k) = PageRank.ranksUntilCounted(g.toDF("src", "dst"), "src", "dst",
      delta = PageRank.Scale / 10L, maxIters = 40)
    assert(k >= 2 && k <= 20, s"expected a mid-range stop round, got $k")
    val converged = df.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(converged == run(g, k))
    assert(converged == reference(g, k))
  }

  test("non-convergence throws instead of returning a misranked table") {
    val g = Seq((1L, 2L)) // source vertex still moving after round 1
    intercept[IllegalStateException] {
      PageRank.ranksUntil(g.toDF("src", "dst"), "src", "dst", delta = 0L, maxIters = 1)
    }
  }

  // ---------------- TrustRank ----------------

  /** Reference: same floor-div recurrence with seed-only restart. */
  private def trustReference(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val verts = e.flatMap(t => Seq(t._1, t._2)).distinct
    val out = e.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val base = verts.map(v => v -> (if (seeds(v)) 15L * PageRank.Scale / 100L else 0L)).toMap
    var r = verts.map(v => v -> (if (seeds(v)) PageRank.Scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / out(src) }.sum
      }
      r = verts.map(v => v -> (base(v) + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def runTrust(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] =
    PageRank.trustRanks(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("v"), iters)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("trust ranks equal the seed-restart floor-div reference bit-for-bit") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L), (5L, 6L))
    assert(runTrust(g, Seq(1L), 5) == trustReference(g, Set(1L), 5))
  }

  test("vertices unreachable from the seeds stay exactly zero; proximity decays") {
    // chain 1→2→3 plus disconnected 5→6; seed = 1
    val g = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val r = runTrust(g, Seq(1L), 5)
    assert(r(5L) == 0L && r(6L) == 0L, "no path from seed → zero trust")
    assert(r(1L) > r(2L) && r(2L) > r(3L), s"trust must decay with distance: $r")
    assert(r(3L) > 0L, "reachable vertices accumulate trust")
  }
}
