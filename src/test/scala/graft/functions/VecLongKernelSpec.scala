package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BIGINT-exact native kernels (vec_dot_l / vec_sqdist_l) must be
  * drop-in twins of the higher-order form they replaced
  * (`aggregate(zip_with(a, b, f), 0L, +)`) — same values, same NULL
  * poisoning on null arrays / null elements / length mismatch, and an
  * error (not silent wraparound) on 64-bit overflow, matching ANSI.
  * Checked over randomized vectors through real DataFrame execution so
  * the codegen path is the one under test.
  */
class VecLongKernelSpec extends SparkSpec {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def hofSq = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  private def df(rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]) = {
    import spark.implicits._
    VecExpressions.register(spark)
    rows.toDF("a", "b")
  }

  test("randomized vectors: native kernels equal the HOF twins exactly") {
    val rnd = new scala.util.Random(20260819L)
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] =
      (1 to 200).map { _ =>
        val n = 1 + rnd.nextInt(64)
        (Seq.fill(n)(java.lang.Long.valueOf(rnd.nextInt(24001) - 12000L)),
         Seq.fill(n)(java.lang.Long.valueOf(rnd.nextInt(24001) - 12000L)))
      }
    val out = df(rows).select(
      call_function("vec_dot_l", col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      call_function("vec_sqdist_l", col("a"), col("b")).as("ns"),
      hofSq(col("a"), col("b")).as("hs")).collect()
    for (r <- out) {
      assert(r.getLong(0) == r.getLong(1), "dot mismatch")
      assert(r.getLong(2) == r.getLong(3), "sqdist mismatch")
    }
  }

  test("null array, null element and length mismatch all poison to NULL, like the HOF") {
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (null, Seq[java.lang.Long](1L, 2L)),                        // null array
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)), // null element
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L)))       // length mismatch
    val out = df(rows).select(
      call_function("vec_dot_l", col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      call_function("vec_sqdist_l", col("a"), col("b")).as("ns"),
      hofSq(col("a"), col("b")).as("hs")).collect()
    for (r <- out; i <- 0 until 4)
      assert(r.isNullAt(i), s"row $r col $i: expected NULL")
  }

  test("64-bit overflow raises instead of wrapping (the ANSI discipline)") {
    val big = Seq[java.lang.Long](Long.MaxValue / 2, Long.MaxValue / 2)
    val e = intercept[Exception] {
      df(Seq((big, big)))
        .select(call_function("vec_dot_l", col("a"), col("b"))).collect()
    }
    def root(t: Throwable): Throwable = Option(t.getCause).map(root).getOrElse(t)
    assert(root(e).isInstanceOf[ArithmeticException] ||
      e.getMessage.contains("overflow"), s"unexpected: $e")
  }
}
