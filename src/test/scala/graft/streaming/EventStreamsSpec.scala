package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  /** Stage the single parquet file into a directory (FileStreamSource
    * requires one) and stream it bounded. */
  private lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def eventStream() = {
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf0001/events.parquet").schema)
      .parquet(stagedDir)
    // same physical-type normalization as the batch reader
    Tables.normalizeEventsTs(raw)
  }

  test("streaming hourly rollup equals the batch rollup") {
    val streamed = EventStreams.runAvailableNow(
      spark, EventStreams.hourlyRollup(eventStream()), "rollup_test", OutputMode.Append)
      .select("hour", "event_type", "n")
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append mode emits only windows the 1-hour watermark has passed;
    // windows still open when the bounded source drains are withheld
    val maxTs = Tables.events(spark, sf0001).agg(max(col("ts"))).head().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    val closedBatch = batch.filter(col("hour") + expr("interval 1 hour") <= lit(cutoff))
    assert(streamed.exceptAll(batch.select("hour", "event_type", "n")).count() == 0)
    assert(closedBatch.exceptAll(streamed).count() == 0)
    assert(streamed.count() >= closedBatch.count())
  }

  test("streaming dedup drops repeated keys") {
    val doubled = eventStream()
    val deduped = EventStreams.runAvailableNow(
      spark, EventStreams.dedupStream(doubled, Seq("event_id")), "dedup_test")
    val n = Tables.events(spark, sf0001).count()
    assert(deduped.count() == n) // source has unique event_ids
  }

  test("streaming KMV distinct sketch equals the batch sketch (bounded state)") {
    // the same typed Aggregator runs under the streaming state store;
    // once the bounded source drains, Complete mode must equal the
    // batch aggregation bit-for-bit — which is also the q_sp1 gate
    // frame, so the streaming path inherits the oracle-checked result
    val streamed = EventStreams.runAvailableNow(
      spark, EventStreams.distinctUsersSketch(eventStream()), "kmv_test",
      OutputMode.Complete)
    val batch = EventStreams.distinctUsersSketch(Tables.events(spark, sf0001))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming sliding KMV windows equal the batch windows (q_sp9's streaming twin)") {
    val streamed = EventStreams.runAvailableNow(
      spark, EventStreams.slidingDistinctSketch(eventStream()), "kmv_slide_test",
      OutputMode.Complete)
    val batch = EventStreams.slidingDistinctSketch(Tables.events(spark, sf0001))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // and each window's estimate equals the q_sp9-style trailing-hour
    // computation for the hour the window CLOSES on (same member set,
    // shifted label): spot-check via the unsaturated-exact property
    val exact = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(expr("unix_micros(ts) div 3600000000").as("hr"), col("user_id"))
    val anyWin = batch.orderBy(col("win_start")).limit(1).head()
    val winStartHr = anyWin.getTimestamp(0).getTime / 3600000L
    val members = exact.filter(col("hr") >= winStartHr && col("hr") < winStartHr + 6)
      .select("user_id").distinct().count()
    assert(anyWin.getLong(1) == members,
      "unsaturated sliding estimate must equal the exact distinct for the window")
  }

  test("flatMapGroupsWithState sessionization matches batch session count for closed sessions") {
    import spark.implicits._
    val ds = eventStream().as[EventStreams.Event]
    val sessions = EventStreams.runAvailableNow(
      spark, EventStreams.sessionize(ds).toDF(), "sess_test")
    // batch sessionization (same 30-min gap)
    val batchSessions = graft.SparkEntry.queries("q_ev2_sessionize")(spark, sf0001)
    // closed-session stream count ≤ total; every closed session must
    // exist in the batch result with identical bounds
    assert(sessions.count() > 0 && sessions.count() <= batchSessions.count())
    val joined = sessions.join(batchSessions,
      sessions("user_id") === batchSessions("user_id") &&
      sessions("session_start") === batchSessions("session_start") &&
      sessions("session_end") === batchSessions("session_end") &&
      sessions("n_events") === batchSessions("n_events"))
    assert(joined.count() == sessions.count())
  }

  test("flatMapGroupsWithState islands: every closed streak matches the batch gate exactly") {
    import spark.implicits._
    val ds = eventStream().as[EventStreams.Event]
    val streamed = EventStreams.runAvailableNow(
      spark, EventStreams.islands(ds).toDF(), "islands_test")
    val batch = graft.SparkEntry.queries("q_ev7_islands")(spark, sf0001)
    // closed-island stream count ≤ total; every emitted island must
    // exist in the batch result with identical bounds and day count
    assert(streamed.count() > 0 && streamed.count() <= batch.count())
    val joined = streamed.join(batch,
      streamed("user_id") === batch("user_id") &&
      streamed("start_day") === batch("start_day") &&
      streamed("end_day") === batch("end_day") &&
      streamed("n_days") === batch("n_days"))
    assert(joined.count() == streamed.count(),
      "streamed islands must be a subset of batch islands, bound-for-bound")
  }
}
