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

  test("hilbertKey is a bijection on the full 8x8 grid") {
    import spark.implicits._
    val grid = (for (x <- 0 until 8; y <- 0 until 8) yield (x, y)).toDF("x", "y")
    val keyed = ZOrder.hilbertKey(grid, col("x"), col("y"), 3, "hd")
      .select("x", "y", "hd").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(keyed.values.toSet == (0L until 64L).toSet, "keys must cover 0..63 exactly once")
  }

  test("hilbert locality: consecutive keys are 4-adjacent cells (Z-order is not)") {
    import spark.implicits._
    val grid = (for (x <- 0 until 8; y <- 0 until 8) yield (x, y)).toDF("x", "y")
    val byKey = ZOrder.hilbertKey(grid, col("x"), col("y"), 3, "hd")
      .orderBy(col("hd")).select("x", "y").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val jumps = byKey.sliding(2).count { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(jumps == 0, s"every consecutive Hilbert pair must be adjacent; $jumps jumps")
    // the same walk under the Morton key DOES jump at quadrant seams —
    // the property Hilbert buys over Z-order
    val byZ = grid.withColumn("z",
        ZOrder.zOrderKey(Seq(col("x"), col("y")), 3))
      .orderBy(col("z")).select("x", "y").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val zJumps = byZ.sliding(2).count { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(zJumps > 0, "premise: the Morton walk must jump somewhere")
  }
}
