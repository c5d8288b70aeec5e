package graft.streaming

import graft.core.TableIO
import graft.functions.TextFunctions
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
  * scan — no corpus×corpus recompute), and survivors append to the
  * corpus table. Checkpointed source offsets make each drop
  * exactly-once; the append is idempotent under micro-batch retries
  * because survivors are re-checked against the (already updated)
  * fingerprint table on replay.
  *
  * Scale shape: NOTHING here rescans corpus TEXT. The signature state
  * (shingles / signatures / band keys) and the fingerprint table are
  * PERSISTED and appended per batch, so every micro-batch touches
  * only batch-sized frames plus keyed joins into the state tables.
  * (At 100 TB, bucket the state tables by their join keys via
  * TableIO.writeBucketed and the state re-joins become exchange-free;
  * the full-rewrite atomic swap below becomes a partition append.)
  *
  * Crash safety: the corpus/state/fp writes are separate swaps, so a
  * failure can leave them inconsistent for one batch. Every append is
  * therefore SELF-idempotent — guarded by a keyed anti-join against
  * its own target's ids (a column-pruned id scan, never text) — so
  * the Structured Streaming replay completes exactly the missing
  * writes and re-applies none.
  */
object CurationStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Start the intake: dropDir JSON-lines files → near-dup-free corpus
    * at corpusPath (jaccard `threshold` vs existing docs), with
    * signature + fingerprint state maintained under statePath. */
  def start(spark: SparkSession, dropDir: String, corpusPath: String,
      statePath: String, checkpointDir: String, threshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream.schema(docSchema).json(dropDir)
      .writeStream
      .queryName("curation-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fpPath = s"$statePath/fp.parquet"
        // within-batch exact dedup: keep the lowest doc_id per fingerprint
        val uniq = batch
          .withColumn("__fp", TextFunctions.fingerprint(col("text")))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
              .orderBy(col("doc_id").asc)))
          .filter(col("__rn") === 1).drop("__rn")
        val haveState = IncrementalDedup.stateExists(statePath)
        val survivors = (if (haveState) {
          // exact dups of accepted docs (incl. replayed ids) drop via
          // the persisted fingerprint table — no corpus text scan.
          // Corpus-sized frame: keyed anti-join, deliberately unhinted
          // (AQE may broadcast while small; at 1 B docs it must not)
          val seen = TableIO.read(s, fpPath).select(col("fp").as("__fp"))
          val fresh = uniq.join(seen, Seq("__fp"), "left_anti")
          val state = IncrementalDedup.readState(s, statePath)
          val freshState = IncrementalDedup.corpusState(fresh, "doc_id", "text")
          val dupIds = IncrementalDedup
            .pairsAgainstState(freshState, state, "doc_id", threshold)
            .select(col("batch_id").as("doc_id")).distinct()
          fresh.join(dupIds, Seq("doc_id"), "left_anti")
        } else uniq).cache()
        val appended = survivors.count() // pin before the swaps below

        // The three targets swap separately, so a mid-batch crash can
        // leave them inconsistent; every append is therefore guarded
        // by an anti-join against ITS OWN target's ids (column-pruned
        // id scans, never text) — the streaming replay completes only
        // the missing writes and re-applies none.
        if (new java.io.File(corpusPath).exists()) {
          val corpus = TableIO.read(s, corpusPath)
          TableIO.writeAtomicSwap(corpus.unionByName(
            survivors.drop("__fp")
              .join(corpus.select(col("doc_id")), Seq("doc_id"), "left_anti")), corpusPath)
        } else TableIO.writeAtomicSwap(survivors.drop("__fp"), corpusPath)

        val survivorFp = survivors.select(col("doc_id"), col("__fp").as("fp"))
        val survivorState = IncrementalDedup.corpusState(
          survivors.drop("__fp"), "doc_id", "text")
        if (haveState) {
          val existing = IncrementalDedup.readState(s, statePath)
          // writeState's three swaps are themselves sequential, so each
          // table guards against ITS OWN ids — a crash between the
          // swaps replays into exactly the tables that missed the batch
          val guarded = IncrementalDedup.CorpusState(
            survivorState.shingles.join(
              existing.shingles.select(col("doc_id")), Seq("doc_id"), "left_anti"),
            survivorState.sig.join(
              existing.sig.select(col("doc_id")), Seq("doc_id"), "left_anti"),
            survivorState.bands.join(
              existing.bands.select(col("doc_id")), Seq("doc_id"), "left_anti"))
          IncrementalDedup.writeState(
            IncrementalDedup.appendState(existing, guarded), statePath)
          val fp = TableIO.read(s, fpPath)
          TableIO.writeAtomicSwap(fp.unionByName(
            survivorFp.join(fp.select(col("doc_id")), Seq("doc_id"), "left_anti")), fpPath)
        } else {
          IncrementalDedup.writeState(survivorState, statePath)
          TableIO.writeAtomicSwap(survivorFp, fpPath)
        }
        survivors.unpersist()
        println(s"[curation-stream] batch $batchId appended $appended docs")
      }
      .start()
  }
}
