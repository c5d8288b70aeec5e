package graft.streaming

import graft.operators.QuantileRegister
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** Streaming twin of the mergeable quantile registers (q_sp12–q_sp15):
  * the register's merge law — shard registers union into a valid
  * sketch, each row carrying its own weight — makes the shard identity
  * free to choose, so the stream shards by (micro-batch, INPUT
  * PARTITION). Rank windows don't run on unbounded streams, so each
  * micro-batch builds its registers as a STATIC frame inside
  * `foreachBatch` (the CurationStream discipline) via the same
  * [[QuantileRegister]] core as the batch gates, partitioned by
  * `spark_partition_id()` — with `Trigger.AvailableNow` the first
  * micro-batch is the ENTIRE backlog, and per-partition sharding is
  * what keeps that from becoming a single-task sort of the corpus
  * (the round-9 weak mark). Estimates read the merged state:
  * ≤ shards·K rows, never the corpus, and the sp13 integer rank bound
  * holds with Σ over (batch, part) shards of (strideᵢ − 1).
  *
  * **Replay atomicity**: each batch STAGES its registers to a hidden
  * `registers/.batch=<id>.staging` directory, then atomically renames
  * it over `registers/batch=<id>` (the TableIO swap discipline). The
  * staging dir's leading dot keeps it invisible to Spark's file
  * listing, so a CONCURRENT `estimates()` reader can never observe a
  * half-written batch: it sees either the old complete directory, no
  * directory (a valid pre-batch merged state — registers are
  * mergeable, so any batch-subset is consistent), or the new complete
  * directory. A replayed batch (Spark re-fires until foreachBatch
  * returns) re-stages and re-swaps wholesale, so a crash-partial write
  * can neither be read as "batch done" nor leak into the state — the
  * rank-bound invariant holds at every instant. Rename atomicity is a
  * same-directory move: exact on POSIX/HDFS; object stores without
  * atomic rename fall back to the single-writer, read-after-stop
  * contract. */
object QuantileRegisterStream {

  val K = 64L

  /** The sp12 stride rule over ONE static micro-batch, sharded by the
    * batch's own input partitions: (part, rn, q, w) (+ `grp` first
    * when grouped). The batch id is NOT a column — it becomes the
    * `batch=<id>` partition directory at write time. */
  def batchRegisters(batch: DataFrame, value: Column, tieCols: Seq[Column],
      grp: Option[Column] = None): DataFrame = {
    // project FIRST (the register core ranks post-projection names),
    // then tag the input partition — the window partitions by it, so
    // no rank sort ever spans more than one input partition
    val named = tieCols.zipWithIndex.map { case (c, i) => c.as(s"t_$i") }
    val tieNames = named.indices.map(i => s"t_$i")
    val projected = batch.select(
      (grp.map(_.as("grp")).toSeq ++ (value.cast(LongType).as("q") +: named))
        .toIndexedSeq: _*)
      .withColumn("part", spark_partition_id().cast(LongType))
    QuantileRegister.registers(projected, valueCol = "q", tieCols = tieNames,
      shardCols = Seq("part"), k = K, grpCols = grp.map(_ => "grp").toSeq)
  }

  /** Continuous register maintenance: every micro-batch stages to the
    * hidden `.batch=<id>.staging` dir, then atomically swaps it over
    * `registers/batch=<id>` (replay-idempotent AND reader-safe — see
    * the atomicity note above). */
  def run(stream: DataFrame, value: Column, tieCols: Seq[Column],
      statePath: String, queryName: String,
      grp: Option[Column] = None): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", s"$statePath/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val staging = s"$statePath/registers/.batch=$batchId.staging"
          batchRegisters(batch, value, tieCols, grp)
            .write.mode("overwrite").parquet(staging)
          swapBatchDir(batch.sparkSession, staging,
            s"$statePath/registers/batch=$batchId")
        }
      }
      .start()

  /** Atomic promote: delete any previous (replayed) live dir, then a
    * same-directory rename of the fully-written staging dir. The only
    * non-atomic instant is "live absent", which is a VALID merged
    * state; a half-written staging dir is never visible to readers
    * (hidden path).
    *
    * Routed through Hadoop's `FileSystem` (the TableIO discipline) so
    * the state path can live on ANY filesystem the parquet staging
    * write itself reaches — local, HDFS (where directory rename is
    * atomic), or an object store (where rename is copy+delete and the
    * guarantee degrades to the single-writer, read-after-stop
    * contract documented above). The previous java.nio implementation
    * could not address non-local schemes at all. */
  private def swapBatchDir(spark: SparkSession, staging: String,
      live: String): Unit = {
    import org.apache.hadoop.fs.Path
    val livePath = new Path(live)
    val fs = livePath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(livePath)) fs.delete(livePath, true)
    if (!fs.rename(new Path(staging), livePath))
      throw new java.io.IOException(
        s"failed to promote staged register batch $staging -> $live")
  }

  /** Grouped (per-key) continuous registers — the q_sp15 twin: one
    * state table, per-group strides/bounds, batch-as-shard discipline
    * unchanged (the shard is (batch, part); groups ride as rows). */
  def runGrouped(stream: DataFrame, grp: Column, value: Column,
      tieCols: Seq[Column], statePath: String, queryName: String): StreamingQuery =
    run(stream, value, tieCols, statePath, queryName, grp = Some(grp))

  private def readState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(s"$statePath/registers")
      .withColumn("batch", col("batch").cast(LongType))

  /** Percentile answers off the merged state — the shared
    * [[QuantileRegister.extract]] rule (one cumulative window over
    * ≤ shards·K register rows, a bounded artifact). */
  def estimates(spark: SparkSession, statePath: String, pcts: Seq[Long]): DataFrame =
    QuantileRegister.extract(readState(spark, statePath), "q",
      Seq("batch", "part"), pcts)

  /** Per-group percentile answers off the grouped state. */
  def estimatesGrouped(spark: SparkSession, statePath: String,
      pcts: Seq[Long]): DataFrame =
    QuantileRegister.extract(readState(spark, statePath), "q",
      Seq("batch", "part"), pcts, grpCols = Seq("grp"))

  /** The exact merge-law bound over the current state:
    * Σ over (batch, part) shards of (strideᵢ − 1). */
  def bound(spark: SparkSession, statePath: String): Long =
    QuantileRegister.mergeBound(readState(spark, statePath), Seq("batch", "part"))
      .head().getLong(0)

  /** Per-group merge-law bounds: (grp, bound). */
  def boundGrouped(spark: SparkSession, statePath: String): DataFrame =
    QuantileRegister.mergeBound(readState(spark, statePath),
      Seq("batch", "part"), grpCols = Seq("grp"))
}
