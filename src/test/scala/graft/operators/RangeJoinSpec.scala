package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketized range join equals the naive BETWEEN join, boundaries half-open") {
    import spark.implicits._
    val points = Seq((1, 0L), (2, 9L), (3, 10L), (4, 15L), (5, 29L), (6, 30L), (7, 100L))
      .toDF("pid", "t")
    val intervals = Seq(
      (10, 10L, 30L),   // [10,30): catches 3,4,5; NOT 2 (9) or 6 (30)
      (11, 0L, 95L),    // spans many buckets: catches 1..5,6
      (12, 50L, 50L),   // empty: catches nothing
      (13, 99L, 101L))  // catches 7
      .toDF("iid", "s", "e")
    for (width <- Seq(1L, 7L, 30L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", width)
        .select("iid", "pid").as[(Int, Int)].collect().toSet
      val naive = points.crossJoin(intervals)
        .filter(col("t") >= col("s") && col("t") < col("e"))
        .select("iid", "pid").as[(Int, Int)].collect().toSet
      assert(got == naive, s"width=$width")
      assert(naive == Set(
        10 -> 3, 10 -> 4, 10 -> 5,
        11 -> 1, 11 -> 2, 11 -> 3, 11 -> 4, 11 -> 5, 11 -> 6,
        13 -> 7))
    }
  }

  test("negative times bucket correctly (floor, not truncation toward zero)") {
    import spark.implicits._
    val points = Seq((1, -5L), (2, -30L)).toDF("pid", "t")
    val intervals = Seq((20, -31L, -4L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 7L)
      .select("iid", "pid").as[(Int, Int)].collect().toSet
    assert(got == Set(20 -> 1, 20 -> 2))
  }
}
