package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Weighted synchronous LPA: the frame rounds must equal a plain-Scala
  * sequential reference on randomized graphs (the coreness/BFS
  * property discipline), the convergence form must terminate on
  * oscillating structure, and the hand-traced cases pin the
  * deterministic tie-break. */
class CommunityLpaSpec extends SparkSpec {

  /** Sequential reference: synchronous weighted LPA, argmax weight,
    * ties to smallest label — independent code path (plain maps). */
  private def reference(edges: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val adj = sym.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    var lab = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (v, nbrs) =>
        val weightByLab = nbrs.groupBy { case (n, _) => lab(n) }
          .view.mapValues(_.map(_._2).sum).toMap
        val best = weightByLab.toSeq.minBy { case (l, ws) => (-ws, l) }._1
        v -> best
      }
    }
    lab
  }

  private def toDf(edges: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b", "w")
  }

  test("hand-traced: weight beats degree; ties go to the smallest label") {
    // star: center 5 touches 1 (w=10) and 2,3 (w=1 each): after one
    // round the center takes label 1 (largest weight, not most nbrs)
    val edges = Seq((5L, 1L, 10L), (5L, 2L, 1L), (5L, 3L, 1L))
    val out = CommunityLpa.communities(toDf(edges), "a", "b", "w", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == 1L)
    // leaves all adopt the center's initial label
    assert(out(1L) == 5L && out(2L) == 5L && out(3L) == 5L)
    // equal weights: smallest label wins
    val tie = Seq((7L, 3L, 2L), (7L, 4L, 2L))
    val out2 = CommunityLpa.communities(toDf(tie), "a", "b", "w", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2(7L) == 3L)
  }

  test("property: frame rounds == sequential reference on randomized weighted graphs") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(12)
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextInt(100) < 25
      } yield (a, b, 1L + rnd.nextInt(5).toLong)).toSeq
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val viaFrames = CommunityLpa.communities(toDf(edges), "a", "b", "w", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val viaRef = reference(edges, rounds)
        assert(viaFrames == viaRef, s"trial $trial (n=$n rounds=$rounds)")
      }
    }
  }

  test("communitiesUntil terminates on a 2-cycle (bipartite oscillation) and on a clique") {
    // even cycle of 4: synchronous LPA oscillates with period 2 —
    // the convergence form must detect the orbit and stop
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 1L, 1L))
    val (_, rCyc) = CommunityLpa.communitiesUntil(toDf(cyc), "a", "b", "w")
    assert(rCyc <= 10, s"oscillating cycle should stop quickly, ran $rCyc")
    // clique converges to the smallest label everywhere
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 1L)
    val (labels, _) = CommunityLpa.communitiesUntil(toDf(k4.toSeq), "a", "b", "w")
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(1L), s"clique must agree on label 1: $out")
  }

  test("round plan: struct-max argmax, no window/sort, one post-join exchange") {
    // the r15 rewrite replaced the row_number window (join + (src,lab)
    // agg exchange + src window exchange = 3 shuffles/round) with a
    // struct-max aggregation over an explicit src repartition that BOTH
    // aggregations reuse (2 shuffles/round). Pin the shape so a
    // refactor can't silently reintroduce the extra exchange or the
    // whole-partition sort.
    import org.apache.spark.sql.functions.col
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L)).flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val se = toDf(edges.map(t => (t._1, t._2, t._3)))
      .select(col("a").as("src"), col("b").as("dst"), col("w"))
    val labels = se.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lab"))
    val plan = CommunityLpa.round(se, labels)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window reappeared:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"round grew extra exchanges ($exchanges):\n$plan")
  }
}
