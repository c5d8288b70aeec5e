package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The plugin path: a session built with
  * spark.sql.extensions=graft.GraftExtensions gets the native
  * functions in plain SQL with no register() call.
  *
  * Extensions bind when a NEW SparkSession instance is created, so the
  * default session is cleared first (getOrCreate would return the
  * shared test session unchanged); the new session reuses the JVM's
  * SparkContext and is NOT stopped (that would kill the shared
  * context), and the shared default is restored afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject vec_dot and extract_sites into SQL") {
    // the spark.sql.extensions STATIC conf only binds at SparkContext
    // creation (impossible on the shared test context), so this drives
    // the same code path programmatically: the config value resolves
    // to exactly this no-arg instantiation + apply
    val ext = Class.forName("graft.GraftExtensions").getDeclaredConstructor()
      .newInstance().asInstanceOf[SparkSessionExtensions => Unit]
    val shared = TestSession.spark // force init so we can restore it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-spec")
        .withExtensions(ext)
        .getOrCreate()
      val dot = spark.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sites = spark.sql(
        "SELECT extract_sites('ACGT', array(1, 3, 9)) AS s")
        .head().getSeq[String](0)
      assert(sites == Seq("A", "G", ""))

      // the optimizer rules ride the same plugin entry point — assert
      // both fire in THIS session (every other spec exercises them via
      // GraftSession's programmatic injection only)
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      spark.range(0, 500)
        .select(col("id"), (col("id") % 7).as("g"), (col("id") % 50).cast("int").as("v"))
        .createOrReplaceTempView("__ext_t")
      val hazardPlan = spark.sql("""SELECT id, sum(v) OVER (PARTITION BY g
        ORDER BY id ROWS BETWEEN 3 PRECEDING AND UNBOUNDED FOLLOWING) AS s
        FROM __ext_t""").queryExecution.executedPlan.toString.toLowerCase
      assert(!hazardPlan.contains("unboundedfollowing"),
        s"TailFrameRewrite must fire through the plugin path:\n$hazardPlan")
      val sk = nullif(col("g"), lit(2))
      val topkPlan = spark.table("__ext_t")
        .orderBy(sk.asc_nulls_first, col("id").asc)
        .select(col("id").as("o_0"), sk.cast(LongType).as("o_1"))
        .limit(5).queryExecution.executedPlan.toString
      assert(topkPlan.contains("TakeOrderedAndProject"),
        s"TopKProjectInline must fire through the plugin path:\n$topkPlan")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
