package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S9 — exactly-once chunked export.
  *
  * The reference delivers pangolin lineage calls to labs as ≤100-row
  * CSV chunks, exactly once, tracked in a chunk-log table
  * (`automation/pangolin_lineage_exporter/pangolin_lineage_exporter.py:64-110`
  * + chunk-log DDL `init.sql:20-96`). Same contract here on files:
  *
  *  - rows already in the log are anti-joined away
  *  - up to `maxRows` pending rows (deterministic key order) form the
  *    next chunk, written as one CSV file
  *  - the log append happens only AFTER the data write succeeds
  *    (write-then-commit ordering, SURVEY §7.4.7): a crash between the
  *    two re-exports the chunk (at-least-once file write) but the
  *    consumer-visible log stays exactly-once.
  */
final class ChunkedExport(spark: SparkSession, logDir: String, outDir: String) {

  private def logExists: Boolean =
    Files.exists(Paths.get(logDir)) && {
      // Files.list holds an open DirectoryStream — close it or every
      // chunk export leaks a directory fd
      val s = Files.list(Paths.get(logDir))
      try s.findFirst().isPresent finally s.close()
    }

  /** Keys already exported. */
  def exportedKeys(keyCol: String): DataFrame =
    if (logExists) spark.read.parquet(logDir).select(keyCol).distinct()
    else spark.emptyDataFrame

  /** Export the next chunk; returns (chunkId, rowsExported). */
  def exportNextChunk(pending: DataFrame, keyCol: String, maxRows: Int): (String, Long) = {
    val newRows0 =
      if (logExists) pending.join(exportedKeys(keyCol), Seq(keyCol), "left_anti")
      else pending
    val chunk = newRows0.orderBy(col(keyCol)).limit(maxRows).cache()
    val n = chunk.count()
    if (n == 0) return ("", 0L)
    val chunkId = java.util.UUID.nameUUIDFromBytes(
      chunk.select(keyCol).collect().map(_.get(0)).mkString(",").getBytes).toString
    // 1) data write
    chunk.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/chunk_$chunkId")
    // 2) log commit — only after the data landed
    chunk.select(col(keyCol), lit(chunkId).as("chunk_id"),
        current_timestamp().as("exported_at"))
      .write.mode("append").parquet(logDir)
    chunk.unpersist()
    (chunkId, n)
  }

  /** Drain: export chunks until no pending rows remain. */
  def exportAll(pending: DataFrame, keyCol: String, maxRows: Int): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    var done = false
    while (!done) {
      val r = exportNextChunk(pending, keyCol, maxRows)
      if (r._2 == 0) done = true else out += r
    }
    out.result()
  }
}
