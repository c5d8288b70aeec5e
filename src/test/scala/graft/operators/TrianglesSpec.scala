package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Triangles.countTriangles(edges.toDF("a", "b"), "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("known graphs count exactly") {
    // a single triangle
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == (3L, 3L, 1L))
    // K4 has C(4,3) = 4 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(run(k4) == (4L, 6L, 4L))
    // a path has none
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (4L, 3L, 0L))
    // a star (worst skew case for the naive plan) has none either —
    // the hub's wedges must all fail to close, not blow up
    val star = (2L to 30L).map(i => (1L, i))
    assert(run(star) == (30L, 29L, 0L))
  }

  test("input canonicalization: direction, duplicates, self-loops") {
    // same triangle given backwards, doubled, with a self-loop mixed in
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 1L), (2L, 2L))
    assert(run(messy) == (3L, 3L, 1L))
  }

  test("wedge fan-out is bounded by the LOW-degree endpoint (hub never the apex)") {
    // hub 1 connects to 2..20; spokes 2-3 also connect to each other.
    // With degree orientation the hub (degree 19) is the wedge apex
    // for NO pair — the only wedge apexes are low-degree spokes.
    val edges = ((2L to 20L).map(i => (1L, i)) :+ (2L, 3L)).toDF("a", "b")
    assert(Triangles.countTriangles(edges, "a", "b").head().getLong(2) == 1L)
  }
}
