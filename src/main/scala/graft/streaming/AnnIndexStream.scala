package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ANN-index maintenance — the serving-side twin of
  * [[graft.operators.IvfIndex.appendToIndex]]'s batch contract: new
  * embedding drops arrive as files, each micro-batch is assigned to
  * cells under the FROZEN coarse codebook and appended to the
  * persisted cell-partitioned index. The codebook never changes inside
  * a stream (FAISS's add-after-train contract; retraining is a
  * rebuild, not an append), so assignment is a pure per-vector map and
  * probe(streamed index) ≡ probe(full rebuild) at every drain point —
  * the IvfIndexSpec append law, lifted to the streaming arrival path.
  *
  * Exactly-once: the file source checkpoints offsets per drop;
  * appended files are only visible after their task commits, and a
  * replayed micro-batch re-appends only if the PREVIOUS attempt never
  * committed its offsets (the standard file-sink/foreachBatch
  * at-least-once seam — callers needing transactional cutover wrap the
  * index dir with TableIO.writeAtomicSwap like the GISAID stream).
  *
  * Scale shape: per batch the work is one broadcast of the (tiny)
  * centroid table into the batch scan + an append of batch-sized
  * files into the touched cells' directories — the corpus-sized index
  * is never read, shuffled, or rewritten.
  */
object AnnIndexStream {

  /** Streaming embeddings need a declared schema. */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Start the maintenance stream: parquet drops in `feedDir` append
    * to the index at `indexPath` under the frozen `centroids`. */
  def start(spark: SparkSession, feedDir: String, indexPath: String,
      centroids: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val feed = spark.readStream.schema(embeddingSchema).parquet(feedDir)
    feed.writeStream
      .queryName("ann-index-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IvfIndex.appendToIndex(batch, centroids, indexPath)
      }
      .start()
  }
}
