package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import ZOrder._
  import spark.implicits._

  /** Reference Morton interleave for the spec's truth. */
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; d <- xs.indices)
      z |= ((xs(d) >> i) & 1L) << (i * xs.size + d)
    z
  }

  test("zOrderKey equals the textbook Morton interleave") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", zOrderKey(Seq($"x", $"y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(Seq(x, y), 4), s"($x,$y)")
    }
  }

  test("quadrant monotonicity: the low quadrant fully precedes the high quadrant") {
    val lo = for (x <- 0L until 8L; y <- 0L until 8L) yield morton(Seq(x, y), 4)
    val hi = for (x <- 8L until 16L; y <- 8L until 16L) yield morton(Seq(x, y), 4)
    assert(lo.max < hi.min)
  }

  test("3-dim interleave stays inside the declared width") {
    val z = Seq((7L, 7L, 7L)).toDF("a", "b", "c")
      .select(zOrderKey(Seq($"a", $"b", $"c"), 3).as("z")).as[Long].head()
    assert(z == (1L << 9) - 1) // all 9 interleaved bits set
  }

  test("z-clustering tightens per-chunk bounding boxes in BOTH dimensions") {
    // 64x64 grid of points; 16 chunks. Sorting by x alone leaves every
    // chunk spanning the full y range; z-sorting bounds both ranges.
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    def maxRanges(ordered: org.apache.spark.sql.DataFrame) = {
      val chunked = ordered.withColumn("rn", monotonically_increasing_id())
        .withColumn("chunk", expr("rn div 256"))
        .groupBy($"chunk")
        .agg((max($"x") - min($"x")).as("rx"), (max($"y") - min($"y")).as("ry"))
        .agg(max($"rx"), max($"ry")).head()
      (chunked.getLong(0), chunked.getLong(1))
    }
    val (zx, zy) = maxRanges(pts
      .orderBy(zOrderKey(Seq($"x", $"y"), 6), $"x", $"y").coalesce(1))
    val (_, xy) = maxRanges(pts.orderBy($"x", $"y").coalesce(1))
    assert(xy == 63L) // x-sort: every chunk spans all of y
    assert(zx <= 16L && zy <= 16L, // z-sort: sqrt-ish locality in both
      s"z-chunk ranges ($zx, $zy) should be bounded in both dims")
  }

  test("clusterByZ range-partitions by the key (one shuffle, sorted files)") {
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val out = clusterByZ(pts, Seq($"x", $"y"), 5, 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), s"must range-shuffle on the z-key:\n$p")
    // partition-level z-ranges must be disjoint and ordered
    val bounds = out.select($"__z")
      .mapPartitions(it => { val s = it.map(_.getLong(0)).toSeq
        if (s.isEmpty) Iterator.empty else Iterator((s.min, s.max, (s == s.sorted))) })
      .collect()
    assert(bounds.forall(_._3), "each partition must be sorted by z")
    val ordered = bounds.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Array((_, aMax, _), (bMin, _, _)) => assert(aMax <= bMin)
      case _ =>
    }
  }
}
