package graft.genomics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** D11 — external-tool stages (mafft / nextclade / pangolin pattern).
  *
  * The reference shells out per 500-sequence batch with a 20-minute
  * timeout and tolerates failed batches up to a <5% threshold
  * (`gisaid/BatchProcessingWorker.java:339-440`,
  * `GisaidApiImporter.java:392-393`). Spark-native shape: one
  * subprocess per PARTITION inside mapPartitions — the partition is
  * the batch, executor parallelism replaces the 32-way shell fan-out
  * (`align_splits.sh`), and a failed tool run poisons only its
  * partition's rows (error column), never the job. The caller applies
  * the failure threshold on the result.
  *
  * The tool contract is FASTA-in/FASTA-out on temp files (mafft-like);
  * tests drive it with `cat`/`sed` stand-ins since the real binaries
  * aren't in this environment.
  */
object PipeStage {

  final case class PipeResult(header: String, seq: String, error: String)

  /** Run `command` (reading `{in}` placeholder path, writing stdout)
    * once per partition over (header, seq) rows. */
  def pipeFasta(df: DataFrame, headerCol: String, seqCol: String,
      command: Seq[String], timeoutMinutes: Int = 20): Dataset[PipeResult] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(headerCol).cast("string"), col(seqCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val rows = it.toSeq
        if (rows.isEmpty) Iterator.empty
        else runBatch(rows, command, timeoutMinutes).iterator
      }
  }

  private def runBatch(rows: Seq[(String, String)], command: Seq[String],
      timeoutMinutes: Int): Seq[PipeResult] = {
    val inFile = File.createTempFile("pipe_in_", ".fasta")
    try {
      Files.writeString(inFile.toPath,
        rows.map { case (h, s) => s">$h\n$s" }.mkString("", "\n", "\n"))
      val cmd = command.map(_.replace("{in}", inFile.getAbsolutePath))
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      // both pipes are drained on their own threads: an undrained
      // stderr blocks a chatty tool once the OS buffer fills, and a
      // main-thread stdout read would block past the timeout if the
      // tool hangs without closing stdout — waitFor must be what the
      // main thread sits in, so destroyForcibly can actually fire
      val outBuf = new java.io.ByteArrayOutputStream()
      val outThread = new Thread(() => proc.getInputStream.transferTo(outBuf))
      val errThread = new Thread(() =>
        proc.getErrorStream.transferTo(java.io.OutputStream.nullOutputStream()))
      outThread.setDaemon(true); errThread.setDaemon(true)
      outThread.start(); errThread.start()
      val finished = proc.waitFor(timeoutMinutes.toLong, TimeUnit.MINUTES)
      if (!finished) {
        proc.destroyForcibly()
        rows.map { case (h, s) => PipeResult(h, s, s"tool timeout after $timeoutMinutes min") }
      } else if ({ outThread.join(60000); proc.exitValue() != 0 }) {
        rows.map { case (h, s) => PipeResult(h, s, s"tool exit ${proc.exitValue()}") }
      } else {
        val out = outBuf.toString("UTF-8")
        val parsed = Fasta.parseString(out).toMap
        rows.map { case (h, s) =>
          parsed.get(h) match {
            case Some(res) => PipeResult(h, res, null)
            case None => PipeResult(h, s, "missing from tool output")
          }
        }
      }
    } catch {
      case e: Exception =>
        rows.map { case (h, s) => PipeResult(h, s, s"tool failed: ${e.getMessage}") }
    } finally {
      inFile.delete()
    }
  }

  /** The reference's success criterion: failed fraction < threshold
    * (GisaidApiImporter.java:392-393). */
  def successReport(results: Dataset[PipeResult], threshold: Double = 0.05): (Long, Long, Boolean) = {
    val agg = results.toDF().agg(
      count(lit(1)).as("total"),
      sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("failed")).head()
    val total = agg.getLong(0); val failed = agg.getLong(1)
    (total, failed, total == 0 || failed.toDouble / total < threshold)
  }
}
