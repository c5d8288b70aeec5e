package graft.operators

import graft.SparkSpec

/** BFS guarantees: hand-traced line/star distances, fixed-round vs
  * convergence equivalence, and a seeded-random property against an
  * independently written queue BFS. */
class BfsSpec extends SparkSpec {

  private def df(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }
  private def srcs(vs: Long*) = {
    import spark.implicits._
    vs.toDF("v")
  }

  test("hand-traced line graph: hops count along the path; unreached absent") {
    // 1-2-3-4-5, isolated component 8-9; source = 1
    val e = df(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)))
    val got = Bfs.hopDistances(e, "a", "b", srcs(1L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("multi-source: nearest source wins; fewer rounds = bounded reach") {
    val e = df(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    val got = Bfs.hopDistances(e, "a", "b", srcs(1L, 6L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
    val bounded = Bfs.hopDistances(e, "a", "b", srcs(1L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), "reach is exactly rounds hops")
  }

  test("randomized property: frame BFS == queue-BFS reference; until == fixed at stop round") {
    val rnd = new scala.util.Random(7)
    val n = 35
    val edges = (for {
      i <- 1 to n; j <- (i + 1) to n
      if rnd.nextDouble() < 0.08
    } yield (i.toLong, j.toLong))
    val sources = Seq(1L, 2L, 3L)
    val (distDf, rounds) = Bfs.hopDistancesUntil(df(edges), "a", "b", srcs(sources: _*))
    val got = distDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent queue BFS
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val inGraph = adj.keySet
    val ref = scala.collection.mutable.Map[Long, Long]()
    val q = scala.collection.mutable.Queue[Long]()
    sources.filter(inGraph).foreach { s => ref(s) = 0L; q.enqueue(s) }
    while (q.nonEmpty) {
      val v = q.dequeue()
      adj.getOrElse(v, Nil).foreach { u =>
        if (!ref.contains(u)) { ref(u) = ref(v) + 1; q.enqueue(u) }
      }
    }
    assert(got == ref.toMap)
    val viaFixed = Bfs.hopDistances(df(edges), "a", "b", srcs(sources: _*), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFixed == got)
  }

  test("convergence form fails loudly when maxRounds is too small") {
    val e = df(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val ex = intercept[IllegalArgumentException] {
      Bfs.hopDistancesUntil(e, "a", "b", srcs(1L), maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
