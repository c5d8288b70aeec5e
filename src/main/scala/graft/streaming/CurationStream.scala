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
  * exactly-once; appends are idempotent under micro-batch retries
  * because every target is guarded by its own already-present keys.
  *
  * Scale shape (VERDICT r4 item 2): per-batch cost is O(batch) work +
  * map-side corpus scans, never an O(corpus) rewrite or shuffle.
  *
  *  - WRITES are appends of new files only: the signature state and
  *    fingerprint table are EXTERNAL BUCKETED parquet tables
  *    (`TableIO.writeBucketedAt`/`appendBucketed`, restart-safe via
  *    file-level existence + catalog re-registration), the corpus a
  *    plain parquet dir appended via `TableIO.appendFiles`. Nothing
  *    corpus-sized is rewritten per batch — the old full atomic swap
  *    was the dominant cost of the whole streaming path at scale.
  *  - READS against corpus-sized tables are exchange-free: every
  *    already-present-key guard runs as [[antiByKey]] — the target is
  *    scanned map-side against the BROADCAST batch keys (semi), and
  *    the tiny hit set broadcasts back into the anti-join. No shuffle
  *    and no sort ever touches a corpus-sized frame, regardless of
  *    join-strategy selection; bucketing additionally keeps plain
  *    keyed joins exchange-free on the state side if a caller outgrows
  *    the broadcast (CurationStreamSpec pins the no-ShuffleExchange
  *    plan).
  *
  * Crash safety: the corpus/state/fp writes land separately, so a
  * failure can leave them inconsistent for one batch. Every append is
  * therefore SELF-idempotent — guarded by its own target's keys
  * (column-pruned key scans, never text) — and the Structured
  * Streaming replay completes exactly the missing writes and
  * re-applies none.
  */
object CurationStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  import IncrementalDedup.antiByKey

  private def fpTableName(statePath: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(statePath.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"graft_state_${h}_fp"
  }

  /** The fingerprint table (doc_id, fp), bucketed by fp — the seen-
    * check join key. Registered on demand (restart-safe). */
  private[streaming] def fpTable(spark: SparkSession, statePath: String,
      buckets: Int): DataFrame = {
    TableIO.ensureBucketedAt(spark, fpTableName(statePath),
      s"$statePath/fp", Seq("fp"), buckets)
    spark.table(fpTableName(statePath))
  }

  /** Maintenance compaction: rewrite the signature + fingerprint state
    * to one file per bucket (appends add a file per bucket per batch).
    * Run between batches on whatever cadence file counts warrant;
    * results are unchanged, only the file layout shrinks. */
  def compactState(spark: SparkSession, statePath: String,
      stateBuckets: Int = 8): Unit = {
    IncrementalDedup.compactStateBucketed(spark, statePath, "doc_id", stateBuckets)
    TableIO.compactBucketedAt(spark, fpTableName(statePath),
      s"$statePath/fp", Seq("fp"), stateBuckets)
  }

  /** Start the intake: dropDir JSON-lines files → near-dup-free corpus
    * at corpusPath (jaccard `threshold` vs existing docs), with
    * signature + fingerprint state maintained under statePath as
    * bucketed append-only tables. */
  def start(spark: SparkSession, dropDir: String, corpusPath: String,
      statePath: String, checkpointDir: String, threshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow(),
      stateBuckets: Int = 8): StreamingQuery = {
    spark.readStream.schema(docSchema).json(dropDir)
      .writeStream
      .queryName("curation-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fpPath = s"$statePath/fp"
        // within-batch exact dedup: keep the lowest doc_id per fingerprint
        val uniq = batch
          .withColumn("__fp", TextFunctions.fingerprint(col("text")))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
              .orderBy(col("doc_id").asc)))
          .filter(col("__rn") === 1).drop("__rn")
        val haveFp = TableIO.exists(s, fpPath)
        val haveState = IncrementalDedup.bucketedStateExists(s, statePath)
        // exact dups of accepted docs (incl. replayed ids) drop via the
        // persisted fingerprint table — no corpus text scan, no shuffle
        val fresh = if (haveFp)
          antiByKey(uniq, fpTable(s, statePath, stateBuckets).select("fp"), "__fp")
        else uniq
        // localCheckpoint (NOT cache): the appends below refresh the
        // state tables in the catalog, and a refresh cascade-UNCACHES
        // every cached plan whose lineage reads them — a cached
        // `survivors` would silently recompute against the
        // already-updated state (where each survivor now self-matches
        // as a dup) and the later appends would write nothing. The
        // checkpoint cuts the lineage to a materialized batch-sized
        // snapshot; if an executor loss drops a block, the batch fails
        // and the streaming replay re-runs it idempotently.
        val survivors = (if (haveState) {
          val state = IncrementalDedup.readStateBucketed(s, statePath, "doc_id", stateBuckets)
          val freshState = IncrementalDedup.corpusState(fresh, "doc_id", "text")
          val dupIds = IncrementalDedup
            .pairsAgainstState(freshState, state, "doc_id", threshold)
            .select(col("batch_id").as("doc_id")).distinct()
          fresh.join(broadcast(dupIds), Seq("doc_id"), "left_anti")
        } else fresh).localCheckpoint()

        // The targets append separately, so a mid-batch crash can leave
        // them inconsistent; every append is therefore guarded by ITS
        // OWN target's already-present keys (column-pruned key scans,
        // never text) — the streaming replay completes only the missing
        // writes and re-applies none.
        val corpusAdd = (if (TableIO.exists(s, corpusPath))
          antiByKey(survivors.drop("__fp"),
            TableIO.read(s, corpusPath).select("doc_id"), "doc_id")
        else survivors.drop("__fp")).cache()
        val appended = corpusAdd.count() // the count that actually lands
        TableIO.appendFiles(corpusAdd, corpusPath)
        corpusAdd.unpersist()

        // per-table id guards live inside appendStateBucketed — a crash
        // between appends replays into exactly the tables that missed
        val survivorState = IncrementalDedup.corpusState(
          survivors.drop("__fp"), "doc_id", "text")
        IncrementalDedup.appendStateBucketed(s, survivorState, statePath, "doc_id", stateBuckets)

        val survivorFp = survivors.select(col("doc_id"), col("__fp").as("fp"))
        if (haveFp)
          TableIO.appendBucketed(
            antiByKey(survivorFp, fpTable(s, statePath, stateBuckets).select("doc_id"), "doc_id"),
            fpTableName(statePath), Seq("fp"), stateBuckets)
        else TableIO.writeBucketedAt(survivorFp, fpTableName(statePath), fpPath,
          Seq("fp"), stateBuckets)
        println(s"[curation-stream] batch $batchId appended $appended docs")
      }
      .start()
  }
}
