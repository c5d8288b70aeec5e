package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The O(E) edge-pin policy: the production form (materialize the
  * static symmetric edge table once via TableIO and re-read — no
  * executor-pinned blocks, resumable) must be ROUND-EQUIVALENT to the
  * test-scale localCheckpoint form for every kernel that takes it. */
class GraphEdgesSpec extends SparkSpec {

  private def edges = {
    import spark.implicits._
    // two components + a tail so BFS/coreness have structure
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (10L, 12L)).toDF("a", "b")
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("pin(Some(dir)) writes once, re-reads, and is idempotent on an existing table") {
    val dir = java.nio.file.Files.createTempDirectory("edgepin-").toString + "/sym_edges"
    val se = GraphEdges.symPinned(edges, "a", "b", Some(dir))
    assert(graft.core.TableIO.exists(spark, dir))
    val firstRows = collectSorted(se)
    // a second pin (a restarted run) must reuse the table, not rewrite
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir)).toMillis
    val again = GraphEdges.symPinned(edges, "a", "b", Some(dir))
    assert(collectSorted(again) == firstRows)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir)).toMillis == mtime, "existing pin must be reused")
    // and the pinned table equals the in-memory form
    assert(firstRows == collectSorted(GraphEdges.sym(edges, "a", "b")))
  }

  test("BFS / k-core / coreness / TrustRank: edgeDir form ≡ localCheckpoint form") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("edgepin-kernels-").toString
    val sources = Seq(1L).toDF("v")

    val bfsLocal = collectSorted(Bfs.hopDistances(edges, "a", "b", sources, 4))
    val bfsDir = collectSorted(Bfs.hopDistances(edges, "a", "b", sources, 4,
      edgeDir = Some(s"$tmp/bfs")))
    assert(bfsLocal == bfsDir && bfsLocal.nonEmpty)

    val peelLocal = collectSorted(KCore.peel(edges, "a", "b", k = 2, rounds = 3))
    val peelDir = collectSorted(KCore.peel(edges, "a", "b", k = 2, rounds = 3,
      edgeDir = Some(s"$tmp/peel")))
    assert(peelLocal == peelDir && peelLocal.nonEmpty)

    val corLocal = collectSorted(KCore.coreness(edges, "a", "b", rounds = 4))
    val corDir = collectSorted(KCore.coreness(edges, "a", "b", rounds = 4,
      edgeDir = Some(s"$tmp/coreness")))
    assert(corLocal == corDir && corLocal.nonEmpty)

    val trLocal = collectSorted(PageRank.trustRanks(edges, "a", "b", sources, iters = 3))
    val trDir = collectSorted(PageRank.trustRanks(edges, "a", "b", sources, iters = 3,
      edgeDir = Some(s"$tmp/trust")))
    assert(trLocal == trDir && trLocal.nonEmpty)

    val ccLocal = collectSorted(ConnectedComponents.components(edges, "a", "b"))
    val ccDir = collectSorted(ConnectedComponents.components(edges, "a", "b",
      edgeDir = Some(s"$tmp/cc")))
    assert(ccLocal == ccDir && ccLocal.nonEmpty)

    val starLocal = collectSorted(ConnectedComponents.componentsStar(edges, "a", "b"))
    val starDir = collectSorted(ConnectedComponents.componentsStar(edges, "a", "b",
      edgeDir = Some(s"$tmp/ccstar")))
    assert(starLocal == starDir && starLocal.nonEmpty)

    val lpaLocal = collectSorted(CommunityLpa.communities(
      edges.withColumnRenamed("a", "x").withColumn("w", lit(1L)), "x", "b", "w", rounds = 3))
    val lpaDir = collectSorted(CommunityLpa.communities(
      edges.withColumnRenamed("a", "x").withColumn("w", lit(1L)), "x", "b", "w", rounds = 3,
      edgeDir = Some(s"$tmp/lpa")))
    assert(lpaLocal == lpaDir && lpaLocal.nonEmpty)
  }

  test("pin reuse is fingerprint-guarded: a changed edge set fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("edgepin-fp-").toString + "/sym_edges"
    val marker = java.nio.file.Paths.get(dir + ".fp")
    GraphEdges.symPinned(edges, "a", "b", Some(dir))
    assert(java.nio.file.Files.exists(marker), "materialization must record a fingerprint")
    // identical edge set reuses cleanly
    GraphEdges.symPinned(edges, "a", "b", Some(dir))
    // a different edge set must NOT be silently computed on the stale pin
    val other = Seq((7L, 8L), (8L, 9L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      GraphEdges.symPinned(other, "a", "b", Some(dir))
    }
    assert(ex.getMessage.contains("does not match"))
    // a legacy dir without a marker self-heals from the stored files...
    java.nio.file.Files.delete(marker)
    GraphEdges.symPinned(edges, "a", "b", Some(dir))
    assert(java.nio.file.Files.exists(marker))
    // ...and then guards again
    intercept[IllegalArgumentException] {
      GraphEdges.symPinned(other, "a", "b", Some(dir))
    }
  }
}
