package graft.operators

import graft.SparkSpec

/** k-center guarantees: hand-traced selection on a line, and a
  * property against an independently written sequential greedy. */
class KCenterSpec extends SparkSpec {

  private def emb(vs: (Long, Seq[Float])*) = {
    import spark.implicits._
    vs.toSeq.toDF("vec_id", "embedding")
  }

  test("hand-traced line: picks the far end, then the middle") {
    // points on a line at 0, 1, 2, 10: start = id 1 (lowest id, at 0);
    // farthest is 10 (id 4); then max-min is the point at 2 (dist 4
    // to 0-side... min(4, 64) = 4) vs 1 (min 1) → id 3; then id 2.
    val e = emb(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(2f), 4L -> Seq(10f))
    val got = KCenter.select(e, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 4L, 2L -> 3L, 3L -> 2L), s"got $got")
  }

  test("property: frame greedy == sequential reference on seeded random vectors") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 60).map(i => i.toLong -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val k = 6
    val got = KCenter.select(emb(pts: _*), k)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    // independent reference: same quantized max-min greedy
    def q(v: Seq[Float]): Seq[Long] = v.map(x => math.floor(x.toDouble * 1000).toLong)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qs = pts.map { case (id, v) => id -> q(v) }.toMap
    var chosen = Vector(pts.map(_._1).min)
    while (chosen.size < k) {
      val next = pts.map(_._1).filterNot(chosen.contains)
        .map(id => id -> chosen.map(c => d2(qs(id), qs(c))).min)
        .minBy { case (id, mind) => (-mind, id) }._1
      chosen :+= next
    }
    assert(got == chosen, s"frame $got vs reference $chosen")
  }

  test("incremental (production) form selects the identical sequence") {
    // same integer distances + tie-breaks, O(N*k) instead of O(N*k^2)
    // distance evals, DISK_ONLY state instead of recompute — the
    // selection sequence must be bit-identical
    val rnd = new scala.util.Random(29)
    val e = emb((1L to 40L).map(i =>
      i -> Seq.fill(4)(rnd.nextFloat() * 2 - 1)): _*)
    val a = KCenter.select(e, 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val b = KCenter.selectIncremental(e, 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(a == b, s"sequences diverge:\n$a\n$b")
    // and on the real embeddings table at the gate's k
    val real = graft.Tables.embeddings(spark, sf0001)
    val ga = KCenter.select(real, 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val gb = KCenter.selectIncremental(real, 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(ga == gb)
  }

  test("k = 1 returns just the deterministic seed") {
    val e = emb(7L -> Seq(1f, 2f), 3L -> Seq(0f, 0f))
    val got = KCenter.select(e, 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 3L)))
  }
}
