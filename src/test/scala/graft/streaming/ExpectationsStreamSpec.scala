package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Expectations
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch, bound-for-bound, for the expectations suite: the
  * streaming counters after a bounded source drains must equal the
  * batch suite rows exactly, and the merge must be monotone — a
  * doubled source doubles every counter, no check row appears or
  * vanishes. */
class ExpectationsStreamSpec extends SparkSpec {

  private val specs = Seq(
    "value_non_negative" -> (col("value").isNotNull && col("value") < 0),
    "event_type_known" -> !col("event_type").isin("click", "view", "purchase", "scroll"),
    "user_id_present" -> col("user_id").isNull)

  private def stage(copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("exp_stream")
    (1 to copies).foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        dir.resolve(s"events_$i.parquet"))
    }
    dir.toString
  }

  private def eventStream(dir: String) = {
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf0001/events.parquet").schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: the merge is exercised
      .parquet(dir)
    Tables.normalizeEventsTs(raw)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streaming column checks == batch suite after the source drains") {
    val streamed = EventStreams.runAvailableNow(spark,
      ExpectationsStream.columnChecks(eventStream(stage(1)), specs),
      "exp_cols_test", OutputMode.Complete)
    val batch = Expectations.columnChecks(Tables.events(spark, sf0001), specs)
    assert(rows(streamed) == rows(batch))
    assert(rows(streamed).size == specs.size)
    // the suite is non-degenerate: totals are the corpus size
    assert(rows(streamed).values.forall(_._2 == Tables.events(spark, sf0001).count()))
  }

  test("monotone merge: a doubled source exactly doubles every counter") {
    val once = rows(EventStreams.runAvailableNow(spark,
      ExpectationsStream.columnChecks(eventStream(stage(1)), specs),
      "exp_once_test", OutputMode.Complete))
    val twice = rows(EventStreams.runAvailableNow(spark,
      ExpectationsStream.columnChecks(eventStream(stage(2)), specs),
      "exp_twice_test", OutputMode.Complete))
    assert(twice.keySet == once.keySet, "no check row may appear or vanish")
    once.foreach { case (check, (v, t)) =>
      assert(twice(check) == (2 * v, 2 * t), s"$check: ${twice(check)} != 2x ($v, $t)")
    }
  }

  test("streaming FK check == batch foreignKeyCheck (stream-static broadcast join)") {
    import spark.implicits._
    // parent: half the users — the stream's other half are orphans
    val users = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().filter(col("user_id") % 2 === 0)
      .as[Long].collect().toSeq.toDF("user_id")
    val streamed = EventStreams.runAvailableNow(spark,
      ExpectationsStream.foreignKeyCheck(eventStream(stage(1)), "user_id",
        "event_user_fk", users, "user_id"),
      "exp_fk_test", OutputMode.Complete)
    val batch = Expectations.foreignKeyCheck(Tables.events(spark, sf0001),
      "user_id", "event_user_fk", users, "user_id")
    assert(rows(streamed) == rows(batch))
    val (v, t) = rows(streamed)("event_user_fk")
    assert(v > 0 && v < t, "the planted orphan set must be a strict subset")
  }
}
