package graft.streaming

import graft.core.TableIO
import graft.operators.IncrementalDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** §2.11 × LLM pipeline — streaming corpus intake with incremental
  * dedup: document drops (JSON-lines files) become micro-batches, each
  * deduplicated FIRST within itself (exact fingerprint — replayed or
  * doubled files collapse), then against the accumulated corpus via
  * [[IncrementalDedup]] (batch bands broadcast into the corpus band
  * scan — no corpus×corpus recompute, see its scaladoc), and survivors
  * append to the corpus table. Checkpointed source offsets make each
  * drop exactly-once; the append is idempotent under micro-batch
  * retries because survivors are re-checked against the (already
  * updated) corpus on replay — a doc_id present in the corpus is an
  * exact dup of itself and gets dropped.
  *
  * At scale the corpus signature state would be persisted and updated
  * incrementally rather than rebuilt per batch (the operator's
  * CorpusState is exactly that persistable shape — bucket it by doc id
  * via TableIO.writeBucketed); here it's derived per batch for
  * simplicity, which is still only ONE corpus scan per micro-batch.
  */
object CurationStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Start the intake: dropDir JSON-lines files → near-dup-free corpus
    * at corpusPath (jaccard `threshold` vs existing docs). */
  def start(spark: SparkSession, dropDir: String, corpusPath: String,
      checkpointDir: String, threshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream.schema(docSchema).json(dropDir)
      .writeStream
      .queryName("curation-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // within-batch exact dedup: keep the lowest doc_id per fingerprint
        val uniq = batch
          .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col("text")))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
              .orderBy(col("doc_id").asc)))
          .filter(col("__rn") === 1).drop("__rn", "__fp")
        val survivors =
          if (new java.io.File(corpusPath).exists()) {
            val corpus = TableIO.read(s, corpusPath)
            // exact dups of corpus docs (incl. replayed ids) drop here;
            // near-dups drop via the LSH pairs
            val fresh = uniq.join(
              corpus.select(graft.functions.TextFunctions.fingerprint(col("text")).as("__fp")),
              graft.functions.TextFunctions.fingerprint(uniq("text")) === col("__fp"), "left_anti")
            val state = IncrementalDedup.corpusState(corpus, "doc_id", "text")
            IncrementalDedup.newDocs(fresh, state, "doc_id", "text", threshold)
          } else uniq
        // pin survivors BEFORE the swap: their plan reads the corpus
        // files, which the swap replaces — an after-the-fact count
        // would re-run the anti-join against the updated corpus
        survivors.cache()
        val appended = survivors.count()
        val merged =
          if (new java.io.File(corpusPath).exists())
            TableIO.read(s, corpusPath).unionByName(survivors)
          else survivors
        TableIO.writeAtomicSwap(merged, corpusPath)
        survivors.unpersist()
        println(s"[curation-stream] batch $batchId appended $appended docs")
      }
      .start()
  }
}
