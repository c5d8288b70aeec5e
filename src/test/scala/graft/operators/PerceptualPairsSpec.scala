package graft.operators

import graft.SparkSpec
import graft.multimodal.PerceptualHash
import org.apache.spark.sql.functions._

/** The q_mm5 pair search's production knob: two 32-bit blocks instead
  * of four 16-bit bands. On the planted fixture the two configurations
  * must find EXACTLY the same pairs (the perturbation is confined to
  * band 0 ⊂ block 0, so block 1 still collides), while the wide form's
  * accidental-candidate rate drops N²/2¹⁶ → N²/2³² per block — the
  * ≥10⁷-image scale path documented in SCALING.md round 9. */
class PerceptualPairsSpec extends SparkSpec {

  private def fingerprints(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map { id =>
      val b = PerceptualHash.dHashBands(PerceptualHash.decodePngGray(
        graft.multimodal.ImageCodec.encodePng(36, 32,
          PerceptualHash.synthCellGrid(id / 4, id % 4))).get)
      (id, b(0), b(1), b(2), b(3))
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  test("wide 32-bit blocks find exactly the narrow config's pairs on the planted fixture") {
    val fp = fingerprints(200).localCheckpoint()
    def pairs(wide: Boolean): Set[(Long, Long, Long)] =
      MultimodalQueries.perceptualPairs(fp, t = 6, wideBlocks = wide)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val narrow = pairs(wide = false)
    val wide = pairs(wide = true)
    assert(narrow == wide, s"recall must be preserved on the planted class: " +
      s"narrow-only ${narrow -- wide}, wide-only ${wide -- narrow}")
    // the fixture plants C(4,2)=6 pairs per complete group of 4 ids
    assert(narrow.size == 50 * 6, s"expected 300 planted pairs, got ${narrow.size}")
    assert(narrow.forall { case (a, b, h) => a / 4 == b / 4 && h <= 6 })
  }

  test("span fixture: the traded recall is exactly the both-halves pair class") {
    // q_mm5b's contract in-JVM: perturbations in rows 0 AND 4 put
    // differing bits in both 32-bit halves; wide blocking may only
    // miss pairs where BOTH blocks differ, and must still find every
    // pair with one block intact
    import spark.implicits._
    val fp = (0L until 200L).map { id =>
      val b = PerceptualHash.dHashBands(PerceptualHash.decodePngGray(
        graft.multimodal.ImageCodec.encodePng(36, 32,
          PerceptualHash.synthCellGridSpan(id / 4, id % 4))).get)
      (id, b(0), b(1), b(2), b(3))
    }.toDF("media_id", "b0", "b1", "b2", "b3").localCheckpoint()
    def pairs(wide: Boolean): Set[(Long, Long, Long)] =
      MultimodalQueries.perceptualPairs(fp, t = 6, wideBlocks = wide)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val narrow = pairs(wide = false)
    val wide = pairs(wide = true)
    assert(wide.subsetOf(narrow), "a wide candidate always has an equal band")
    val traded = narrow -- wide
    assert(traded.nonEmpty, "the span fixture must actually exercise the trade")
    val bands = fp.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def blocksDiffer(a: Long, b: Long): (Boolean, Boolean) = {
      val (a0, a1, a2, a3) = bands(a); val (b0, b1, b2, b3) = bands(b)
      (a0 != b0 || a1 != b1, a2 != b2 || a3 != b3)
    }
    for ((a, b, _) <- traded) {
      val (lo, hi) = blocksDiffer(a, b)
      assert(lo && hi, s"traded pair ($a,$b) must differ in BOTH halves")
    }
    for ((a, b, _) <- narrow if !traded.contains((a, b, 0L)) && wide.exists(w => w._1 == a && w._2 == b)) {
      val (lo, hi) = blocksDiffer(a, b)
      assert(!lo || !hi, s"wide-found pair ($a,$b) must have an intact half")
    }
  }

  test("wide blocks never produce a cartesian plan") {
    val fp = fingerprints(40)
    val p = MultimodalQueries.perceptualPairs(fp, 6, wideBlocks = true)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }
}
