package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the quantile registers with MICRO-BATCHES AS
  * SHARDS: after a bounded source drains, the state table must hold
  * exactly the registers a static per-file build produces, and the
  * merged estimates must respect the sp13 integer rank bound over the
  * full streamed multiset. */
class QuantileRegisterStreamSpec extends SparkSpec {

  private def stage(copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("qreg_stream")
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
      .option("maxFilesPerTrigger", 1) // one file per micro-batch = one shard
      .parquet(dir)
    Tables.normalizeEventsTs(raw)
  }

  test("streamed registers == static per-file registers; estimates within the merge bound") {
    val statePath = java.nio.file.Files.createTempDirectory("qreg_state").toString
    val q = QuantileRegisterStream.run(eventStream(stage(2)),
      floor(col("value")), Seq(col("event_id")), statePath, "qreg_test")
    q.processAllAvailable(); q.stop()

    // batch twin: each staged file is one shard — identical rule
    val static = (0L to 1L).map { bid =>
      QuantileRegisterStream.batchRegisters(
        Tables.events(spark, sf0001), floor(col("value")), Seq(col("event_id")), bid)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }.flatten.sorted
    val streamed = graft.core.TableIO.read(spark, s"$statePath/registers")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // the two files are copies, so both shards carry the same (rn, q, w)
    // rows under their own shard ids — bound-for-bound equality
    assert(streamed == static.toSeq, s"streamed ${streamed.take(3)}… vs static ${static.take(3)}…")
    assert(streamed.nonEmpty && streamed.map(_._1).distinct.sorted == Seq(0L, 1L))

    // the merged estimate obeys the integer rank bound over the FULL
    // streamed multiset (both file-shards)
    val exact = {
      val one = Tables.events(spark, sf0001)
        .select(floor(col("value")).cast("long").as("q")).collect().map(_.getLong(0))
      (one ++ one).sorted
    }
    val bound = QuantileRegisterStream.bound(spark, statePath)
    val est = QuantileRegisterStream.estimates(spark, statePath, Seq(25L, 50L, 75L))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(est.length == 3)
    for ((p, v) <- est) {
      val lo = exact.indexWhere(_ == v) + 1
      val hi = exact.lastIndexWhere(_ == v) + 1
      assert(lo >= 1, s"p$p: estimate $v not a data value")
      val target = exact.length.toLong * p / 100
      // extraction slack: merge bound + the largest stride (sp14 rule)
      val maxStride = graft.core.TableIO.read(spark, s"$statePath/registers")
        .agg(max(col("w"))).head().getLong(0)
      assert(target >= lo - bound - maxStride && target <= hi + bound + maxStride,
        s"p$p: $v spans [$lo,$hi], target $target, slack ${bound + maxStride}")
    }
  }

  test("micro-batch replay is idempotent: re-running over the same source adds nothing") {
    val dir = stage(1)
    val statePath = java.nio.file.Files.createTempDirectory("qreg_replay").toString
    val q1 = QuantileRegisterStream.run(eventStream(dir),
      floor(col("value")), Seq(col("event_id")), statePath, "qreg_replay_1")
    q1.processAllAvailable(); q1.stop()
    val n1 = graft.core.TableIO.read(spark, s"$statePath/registers").count()
    // fresh checkpoint, same batch ids re-delivered — the presence
    // guard must skip them
    val cp = java.nio.file.Paths.get(s"$statePath/_checkpoint")
    org.apache.commons.io.FileUtils.deleteDirectory(cp.toFile)
    val q2 = QuantileRegisterStream.run(eventStream(dir),
      floor(col("value")), Seq(col("event_id")), statePath, "qreg_replay_2")
    q2.processAllAvailable(); q2.stop()
    val n2 = graft.core.TableIO.read(spark, s"$statePath/registers").count()
    assert(n1 == n2, s"replayed batch must not duplicate registers: $n1 -> $n2")
    assert(n1 > 0)
  }
}
