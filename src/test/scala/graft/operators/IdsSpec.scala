package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The partition-offset global row_number must equal the unpartitioned
  * window form exactly (unique order keys), while never running an
  * unpartitioned window itself. */
class IdsSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sf0001)

  private def windowForm(order: Seq[org.apache.spark.sql.Column]) =
    orders.select(col("o_orderkey"),
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("globalRowNumber == unpartitioned row_number, asc and desc, any partition count") {
    for ((order, nParts) <- Seq(
        (Seq(col("o_custkey").asc, col("o_orderkey").asc), 7),
        (Seq(col("o_custkey").desc, col("o_orderkey").desc), 3),
        (Seq(col("o_orderdate").asc, col("o_orderkey").asc), 0))) {
      val expected = windowForm(order)
      val got = Ids.globalRowNumber(orders, order, "rn", nParts)
        .select(col("o_orderkey"), col("rn"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"nParts=$nParts mismatch")
    }
  }

  test("ids are dense 1..N and the schema keeps every input column") {
    val out = Ids.globalRowNumber(orders, Seq(col("o_orderkey").asc), "gid", 5)
    assert(out.columns.toSeq == orders.columns.toSeq :+ "gid")
    val ids = out.select(col("gid")).collect().map(_.getLong(0)).sorted
    assert(ids.head == 1L && ids.last == ids.length.toLong &&
      ids.distinct.length == ids.length)
  }

  test("plan: no window at all — ranks come from the partition-parallel zipWithIndex") {
    val out = Ids.globalRowNumber(orders,
      Seq(col("o_custkey").asc, col("o_orderkey").asc), "rn", 7)
    val p = out.queryExecution.optimizedPlan.toString
    assert(!p.contains("Window"),
      s"globalRowNumber must not fall back to a window:\n${p.take(1500)}")
  }

  test("stability: repeated materializations of one result assign identical ids") {
    // the bug this operator exists to avoid: offsets derived from a
    // DIFFERENT partition assignment than the ranking pass (separate
    // actions resample range boundaries). zipWithIndex welds both
    // passes to one lineage; two collects of the same result frame —
    // each a fresh execution — must agree exactly.
    val out = Ids.globalRowNumber(orders,
      Seq(col("o_custkey").desc, col("o_orderkey").desc), "rn", 3)
      .select(col("o_orderkey"), col("rn"))
    val a = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
