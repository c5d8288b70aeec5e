package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("chains, cliques and isolated pairs resolve to min-id components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter > 1: needs multiple rounds), pair 10-11,
    // triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val comp = ConnectedComponents.components(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    val drops = ConnectedComponents.dropSet(edges, "a", "b")
      .as[Long].collect().toSet
    assert(drops == Set(2L, 3L, 4L, 11L, 21L, 22L))
  }

  test("agrees with a reference union-find on a random-ish graph") {
    import spark.implicits._
    // deterministic pseudo-random edges over 200 vertices
    val edges = (0 until 300).map { i =>
      val a = (i * 37) % 200; val b = (i * i * 13 + 7) % 200
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val parent = Array.tabulate(200)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> {
        // min vertex of the component, among vertices that appear in edges
        val root = find(v.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(u => find(u.toInt) == root).min
      }).toMap
    val got = ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("star algorithm agrees with propagation on chains, cliques and random graphs") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val prop = ConnectedComponents.components(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val star = ConnectedComponents.componentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    val rnd = (0 until 300).map { i =>
      ((i * 37) % 200).toLong -> ((i * i * 13 + 7) % 200).toLong
    }.filter(p => p._1 != p._2).toDF("a", "b")
    assert(ConnectedComponents.componentsStar(rnd, "a", "b")
      .as[(Long, Long)].collect().toMap ==
      ConnectedComponents.components(rnd, "a", "b")
        .as[(Long, Long)].collect().toMap)
  }

  test("star algorithm resolves a 128-node path — the O(diameter) killer — in few rounds") {
    import spark.implicits._
    // propagation needs ~127 rounds here; the star algorithm's
    // doubling must land well inside 15
    val path = (1L until 128L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = ConnectedComponents.componentsStar(path, "a", "b", maxIters = 15)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 128 && comp.values.forall(_ == 1L))
  }

  test("non-convergence at maxIters throws instead of returning split clusters") {
    import spark.implicits._
    // a 6-vertex path has diameter 5: min-label propagation needs ~5
    // rounds, so maxIters=2 must fail loudly (silent non-convergence
    // would let dropSet keep several representatives of one cluster)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.components(path, "a", "b", maxIters = 2)
    }
    // best-effort mode returns labels without throwing
    val lax = ConnectedComponents.components(path, "a", "b", maxIters = 2,
      failOnNonConvergence = false)
    assert(lax.count() == 6)
  }
}
