package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-core guarantees: hand-traced peel cascade, convergence form ≡
  * fixed-round form at the stop round, and the loud-failure contract. */
class KCoreSpec extends SparkSpec {

  // cycle 1-2-3-4-1 with tail 4-5-6: the 2-core is the cycle; the
  // tail peels end-first (6 in round 1, 5 in round 2, stable round 3)
  private def tailedCycle = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
  }

  test("hand-traced 2-core: cycle survives, tail peels; core degrees exact") {
    val core = KCore.peel(tailedCycle, "a", "b", 2, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L),
      s"got $core")
  }

  test("peelUntil stops at the fixpoint and equals the fixed-round form there") {
    val (core, rounds) = KCore.peelUntil(tailedCycle, "a", "b", 2)
    assert(rounds == 3, s"cascade 6→5→stable must take 3 rounds, got $rounds")
    val viaUntil = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFixed = KCore.peel(tailedCycle, "a", "b", 2, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUntil == viaFixed)
  }

  test("k above the max degree empties the core (and converges, no hang)") {
    val (core, _) = KCore.peelUntil(tailedCycle, "a", "b", 4)
    assert(core.count() == 0L)
  }

  test("peelUntil fails loudly when maxRounds is too small for the cascade") {
    val e = intercept[IllegalArgumentException] {
      KCore.peelUntil(tailedCycle, "a", "b", 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("higher k on a denser graph: 3-core of a clique-with-pendant") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant 4-5: 3-core = the K4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val core = KCore.peel(edges, "a", "b", 3, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  // ---------------- coreness decomposition ----------------

  test("coreness hand-trace: K4 + pendant chain labels 3/1, tailed cycle labels 2/1") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = KCore.coreness(k4, "a", "b", 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L, 6L -> 1L),
      s"got $got")
    val cyc = KCore.coreness(tailedCycle, "a", "b", 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cyc == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("randomized property: h-index coreness == brute-force max-k peel membership") {
    import spark.implicits._
    // seeded G(n, p): every pair once, deterministic membership
    val rnd = new scala.util.Random(42)
    val n = 40
    val edges = (for {
      i <- 1 to n; j <- (i + 1) to n
      if rnd.nextDouble() < 0.12
    } yield (i.toLong, j.toLong)).toDF("a", "b")
    val (viaH, _) = KCore.corenessUntil(edges, "a", "b")
    val got = viaH.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: coreness(v) = max k such that v survives the k-peel
    // fixpoint (Seidman's definition, computed by the independently
    // implemented peel path)
    val maxDeg = got.values.max.toInt
    val brute = scala.collection.mutable.Map[Long, Long]()
    for (k <- 1 to maxDeg + 1) {
      val (core, _) = KCore.peelUntil(edges, "a", "b", k)
      core.collect().foreach(r => brute(r.getLong(0)) = k.toLong)
    }
    assert(got == brute.toMap, {
      val diff = (got.keySet ++ brute.keySet)
        .filter(v => got.get(v) != brute.get(v)).take(10)
      s"mismatch at vertices $diff: h=${diff.map(got.get)}, brute=${diff.map(brute.get)}"
    })
  }

  test("corenessUntil matches the fixed-round gate form and reports its rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 5L)).toDF("a", "b")
    val (conv, rounds) = KCore.corenessUntil(edges, "a", "b")
    val viaFixed = KCore.coreness(edges, "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == viaFixed)
    assert(rounds >= 1)
  }
}
