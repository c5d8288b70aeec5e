package graft.streaming

import graft.core.TableIO
import graft.jobs.GisaidImport
import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** §2.11 — streaming twin of the GISAID import (§3.1).
  *
  * The reference runs the import as a polling loop
  * (`GisaidApiImporter.java` under `automation/`, sleep-and-repeat);
  * Structured Streaming replaces the loop with a file-arrival source:
  * each JSON-lines drop landing in the feed directory becomes a
  * micro-batch, normalized by the SAME batch kernel
  * ([[GisaidImport.normalizeFeed]] — stream ≡ batch by construction)
  * and merged into the live table via foreachBatch (M1 upsert +
  * M6 atomic swap). Checkpointed source offsets make each file
  * exactly-once; the swap is idempotent under micro-batch retries
  * because the upsert is keyed.
  *
  * Scale shape: the file source lists incrementally (maxFilesPerTrigger
  * bounds batch size); the merge shuffles only the micro-batch + the
  * key columns of the live table — with the live table bucketed by
  * gisaid_epi_isl (TableIO.writeBucketed) the join co-locates.
  */
object GisaidStream {

  /** The feed's declared schema — streaming JSON requires one (schema
    * drift on a stream is caught by the S5 check on each batch's
    * columns upstream in production). */
  val feedSchema: StructType = StructType(Seq(
    StructField("covv_accession_id", StringType),
    StructField("covv_virus_name", StringType),
    StructField("covv_collection_date", StringType),
    StructField("covv_location", StringType),
    StructField("covv_patient_age", StringType),
    StructField("covv_gender", StringType),
    StructField("covv_lineage", StringType),
    StructField("covv_subm_date", StringType),
    StructField("sequence", StringType)))

  /** Start the continuous import: feedDir → normalized upsert into
    * tablePath. AvailableNow drains what's present and stops (the test
    * and cron shape); pass a ProcessingTime trigger for a long-lived
    * daemon. */
  def start(spark: SparkSession, feedDir: String, tablePath: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val feed = spark.readStream.schema(feedSchema).json(feedDir)
    val normalized = GisaidImport.normalizeFeed(spark, feed)
    normalized.writeStream
      .queryName("gisaid-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replays within a batch (same file listed twice) collapse on
        // the key; max date wins, and same-date peers resolve by
        // content hash so a micro-batch retry picks the SAME winner
        // (row_number over version alone would pick arbitrarily)
        val deduped = graft.genomics.Annotations.keepMaxVersion(
          batch.withColumn("__v", coalesce(col("date").cast("string"), lit(""))),
          "gisaid_epi_isl", "__v",
          md5(to_json(struct(batch.columns.map(col): _*))).desc).drop("__v")
        val existing =
          if (TableIO.exists(batch.sparkSession, tablePath)) TableIO.read(batch.sparkSession, tablePath)
          else batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), deduped.schema)
        TableIO.writeAtomicSwap(
          Upsert.upsert(existing, deduped, Seq("gisaid_epi_isl")), tablePath)
        println(s"[gisaid-stream] batch $batchId merged ${deduped.count()} records")
      }
      .start()
  }
}
