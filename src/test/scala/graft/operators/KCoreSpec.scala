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
}
