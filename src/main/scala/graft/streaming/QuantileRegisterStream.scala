package graft.streaming

import graft.core.TableIO
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** Streaming twin of the mergeable quantile registers (q_sp12/q_sp13):
  * the register's merge law — shard registers union into a valid
  * sketch, each row carrying its own weight — makes MICRO-BATCHES the
  * shards. Rank windows don't run on unbounded streams, so each
  * micro-batch builds its registers as a STATIC frame inside
  * `foreachBatch` (the CurationStream discipline) and appends them,
  * tagged with the batch id as the shard, to a state parquet table.
  * Estimates read the merged state: ≤ batches·K rows per key column,
  * never the corpus, and the sp13 integer rank bound holds with
  * Σ over batches of (strideᵦ − 1).
  *
  * Appends are idempotent under micro-batch replays: a batch's rows
  * are guarded by their own (batch_id) presence in the state. */
object QuantileRegisterStream {

  val K = 64L

  /** The sp12 stride rule over ONE static micro-batch (the batch is
    * the shard): deterministic rank by (q, tieCols), per-batch
    * power-of-two stride keeping ⌈n/s⌉ ≤ K register rows. */
  def batchRegisters(batch: DataFrame, value: Column, tieCols: Seq[Column],
      batchId: Long): DataFrame = {
    // project FIRST, then rank over the projected (q, ties) — the
    // window must reference post-projection columns
    val w = Window.orderBy((col("q") +: tieCols).map(_.asc): _*)
    batch
      .select((value.cast(LongType).as("q") +: tieCols).toIndexedSeq: _*)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast(LongType))
      .withColumn("m", expr(s"(n + ${K - 1}) div $K"))
      .withColumn("w", when(col("m") <= 1L, lit(1L))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(m - 1)) AS INT))")))
      .filter((col("rn") - 1L) % col("w") === 0L)
      .select(lit(batchId).as("shard"), col("rn"), col("q"), col("w"))
  }

  /** Continuous register maintenance: every micro-batch appends its
    * registers to `statePath` (skipped if the batch id is already
    * present — replay-idempotent). */
  def run(stream: DataFrame, value: Column, tieCols: Seq[Column],
      statePath: String, queryName: String): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", s"$statePath/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val seen = TableIO.exists(spark, s"$statePath/registers") &&
          !TableIO.read(spark, s"$statePath/registers")
            .filter(col("shard") === batchId).isEmpty
        if (!seen && !batch.isEmpty)
          TableIO.appendFiles(
            batchRegisters(batch, value, tieCols, batchId),
            s"$statePath/registers")
      }
      .start()

  /** Percentile answers off the merged state (the sp14 rule): one
    * cumulative window over ≤ batches·K register rows. */
  def estimates(spark: SparkSession, statePath: String, pcts: Seq[Long]): DataFrame = {
    val reg = TableIO.read(spark, s"$statePath/registers")
    val cum = reg
      .withColumn("cw", sum(col("w")).over(
        Window.orderBy(col("q"), col("shard"), col("rn"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(reg.agg(sum(col("w")).cast(LongType).as("tw")))
    val p = pcts.map(x => lit(x))
    spark.range(1).select(explode(array(p: _*)).as("pct"))
      .join(cum, col("cw") * 100 >= col("tw") * col("pct"))
      .groupBy(col("pct")).agg(min(col("q")).as("est_q"))
      .orderBy(col("pct"))
  }

  /** The exact merge-law bound over the current state:
    * Σ over batches of (strideᵦ − 1). */
  def bound(spark: SparkSession, statePath: String): Long =
    TableIO.read(spark, s"$statePath/registers")
      .groupBy(col("shard")).agg(max(col("w")).as("st"))
      .agg(coalesce(sum(col("st") - 1L), lit(0L))).head().getLong(0)
}
