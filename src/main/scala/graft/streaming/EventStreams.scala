package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators.
  *
  * The reference has no true streaming — every "live" behavior is a
  * polling incremental-batch loop (`core/Looper.java`,
  * `automation_base.R:15-25`; SURVEY §2.11). Here the same pipelines
  * are expressed against `readStream` so a deployment can run them
  * either as scheduled batch (`Trigger.AvailableNow` replacing the
  * polling loops) or continuously. Event-time watermarks bound state;
  * the column names match graft.operators.EventQueries so switching
  * read ↔ readStream needs no query changes.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Tumbling-hour rollup by event_type with a 1-hour watermark —
    * streaming twin of q_ev1_hourly_rollup. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on a key within the watermark horizon
    * (the streaming form of M2 insert-if-absent). */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates(keyCols :+ "ts")

  /** Gap-based sessionization with custom keyed state — the streaming
    * twin of q_ev2_sessionize (30-min gap), via
    * flatMapGroupsWithState with event-time timeout. Emits a session
    * when a gap closes it; open sessions stay in state.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Timestamp, Timestamp, Long), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[(Timestamp, Timestamp, Long)]) =>
          val out = Seq.newBuilder[Session]
          var cur = state.getOption
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            cur match {
              case Some((start, end, n)) if e.ts.getTime - end.getTime <= gapSeconds * 1000 =>
                cur = Some((start, e.ts, n + 1))
              case Some((start, end, n)) =>
                out += Session(userId, start, end, n)
                cur = Some((e.ts, e.ts, 1L))
              case None =>
                cur = Some((e.ts, e.ts, 1L))
            }
          }
          if (state.hasTimedOut) {
            cur.foreach { case (s0, e0, n) => out += Session(userId, s0, e0, n) }
            state.remove()
          } else {
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._2.getTime + gapSeconds * 1000)
            }
          }
          out.result().iterator
      }
  }

  final case class Island(user_id: Long, start_day: Long, end_day: Long,
      n_days: Long)

  /** Consecutive-day activity streaks with custom keyed state — the
    * streaming twin of q_ev7_islands: per-user state is the ONE open
    * island (start_day, end_day, n_days); a day extending the streak
    * updates it, a gap emits the closed island and reopens, repeats
    * within the island are idempotent. Event-time timeout (watermark
    * past end_day + 1) closes an island whose streak can no longer be
    * extended — so emitted islands are FINAL, the append-mode
    * contract. State per user is three longs forever; days older than
    * the open island are dropped (the watermark lateness contract,
    * same simplification as [[sessionize]]). */
  def islands(events: Dataset[Event]): Dataset[Island] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), Island](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          val out = Seq.newBuilder[Island]
          var cur = state.getOption
          batch.toSeq.map(e => Math.floorDiv(e.ts.getTime, 86400000L))
            .distinct.sorted.foreach { day =>
              cur match {
                case Some((_, e0, _)) if day <= e0 => () // inside the open island
                case Some((s0, e0, n)) if day == e0 + 1 => cur = Some((s0, day, n + 1))
                case Some((s0, e0, n)) =>
                  out += Island(userId, s0, e0, n)
                  cur = Some((day, day, 1L))
                case None => cur = Some((day, day, 1L))
              }
            }
          if (state.hasTimedOut) {
            cur.foreach { case (s0, e0, n) => out += Island(userId, s0, e0, n) }
            state.remove()
          } else {
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp((c._2 + 2) * 86400000L)
            }
          }
          out.result().iterator
      }
  }

  /** Distinct-users-per-event-type via the KMV sketch — the
    * bounded-state streaming form of q_sp1. An exact streaming
    * `approx`-free distinct grows state with every user ever seen; the
    * sketch caps per-group state at k longs FOREVER while the estimate
    * stays within the KMV error bound. The same typed Aggregator runs
    * in batch and streaming (the state store holds the partial sketch
    * buffer), so stream ≡ batch bit-for-bit once the source drains. */
  def distinctUsersSketch(events: DataFrame, k: Int = 64): DataFrame =
    events.select(col("event_type"),
        graft.operators.Sketches.md5Long56(
          concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.operators.Sketches.kmvSketch(k)(col("h")).as("__kmv_sk"))
      .select(col("event_type"),
        graft.operators.Sketches.kmvEstimate("__kmv_sk", k).as("nd_est"))

  /** Sliding-window distinct users via the KMV sketch — the streaming
    * twin of the q_sp9 batch gate: Spark's native sliding event-time
    * window (6 h length, 1 h slide) over the same typed Aggregator.
    * State is bounded at k longs per OPEN window (≤ 6 concurrent per
    * group under the slide), and the 1-hour watermark lets closed
    * windows evict — the state never grows with users seen. The batch
    * twin runs the identical expression (stream ≡ batch once the
    * source drains, spec-pinned); window labels are [start, start+6h)
    * interval structs, whereas q_sp9 keys trailing windows by their
    * last hour — same contents, shifted label. */
  def slidingDistinctSketch(events: DataFrame, k: Int = 64): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"),
        graft.operators.Sketches.md5Long56(
          concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      .groupBy(window(col("ts"), "6 hours", "1 hour"))
      .agg(graft.operators.Sketches.kmvSketch(k)(col("h")).as("__kmv_sk"))
      .select(col("window.start").as("win_start"),
        graft.operators.Sketches.kmvEstimate("__kmv_sk", k).as("nd_est"))

  /** Run any streaming transform over a bounded source and collect the
    * complete result via a memory sink — the Trigger.AvailableNow
    * pattern that replaces the reference's polling loops. */
  def runAvailableNow(spark: SparkSession, out: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = out.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
