package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expectation checks against hand-crafted frames with known
  * violation counts of every kind. */
class ExpectationsSpec extends SparkSpec {

  test("column checks: nulls and ranges counted off one scan") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, null), (null, 99L), (4L, -5L), (5L, 20L))
      .toDF("k", "v")
    val out = Expectations.columnChecks(df, Seq(
        ("not_null_k", col("k").isNull),
        ("not_null_v", col("v").isNull),
        ("range_v_0_50", col("v") < 0 || col("v") > 50)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "not_null_k" -> ((1L, 5L)),
      "not_null_v" -> ((1L, 5L)),
      // null v rows fail neither range bound (null predicate -> not counted)
      "range_v_0_50" -> ((2L, 5L))))
  }

  test("uniqueness counts ROWS participating in duplicated keys") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"), (3, "f"))
      .toDF("k", "x")
    val out = Expectations.uniqueCheck(df, "u", Seq("k")).head()
    assert((out.getLong(1), out.getLong(2)) == ((5L, 6L)),
      "three k=1 rows + two k=3 rows participate in duplicates")
  }

  test("foreign-key check counts orphans; clean child passes") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val out = Expectations.foreignKeyCheck(child, "fk", "fk_chk", parent, "pk").head()
    assert((out.getLong(1), out.getLong(2)) == ((2L, 4L)))
    val clean = Expectations.foreignKeyCheck(
      Seq(1L, 2L).toDF("fk"), "fk", "fk_chk", parent, "pk").head()
    assert((clean.getLong(1), clean.getLong(2)) == ((0L, 2L)))
  }

  test("a suite unions check rows and can gate a job (ImportReport discipline)") {
    import spark.implicits._
    val df = Seq((1, 5), (2, 5), (2, 6)).toDF("k", "v")
    val report = Expectations.suite(Seq(
      Expectations.columnChecks(df, Seq(("not_null_k", col("k").isNull))),
      Expectations.uniqueCheck(df, "unique_k", Seq("k"))))
    val rows = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("not_null_k" -> 0L, "unique_k" -> 2L))
    // the gate pattern: breached expectations fail the stage
    val breached = report.filter(col("violations") > 0).count()
    assert(breached == 1L)
  }
}
