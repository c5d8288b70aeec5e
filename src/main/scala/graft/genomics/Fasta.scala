package graft.genomics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — FASTA codec.
  *
  * Reference parses/writes FASTA in four places
  * (`gisaid/BatchProcessingWorker.java:300-336`,
  * `database/R/utility.R:381-486`, `python/import_sequences.py:37-41`,
  * and a SQL `string_agg` formatter
  * `database/sql/consensus_sequence.sql:314-318`). Here: one codec.
  *
  * Records can span arbitrary line counts, so a plain line-split read
  * can't parse them independently; we read whole files (one per task)
  * and split on '>' headers inside the partition. Good for the
  * many-medium-files layout the reference uses (10k-sequence chunks);
  * a splittable custom FileFormat is the v2 path for single huge files.
  */
object Fasta {

  /** Parse one FASTA document into (header, sequence) pairs;
    * blank-line tolerant, multi-line sequences joined. */
  def parseString(content: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var header: String = null
    val sb = new StringBuilder
    content.linesIterator.foreach { line =>
      val t = line.trim
      if (t.startsWith(">")) {
        if (header != null) out += ((header, sb.toString))
        header = t.drop(1).trim
        sb.clear()
      } else if (t.nonEmpty && header != null) sb.append(t)
    }
    if (header != null) out += ((header, sb.toString))
    out.result()
  }

  /** Read FASTA file(s) → DataFrame(header string, seq string). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseString(content) }
      .toDF("header", "seq")
  }

  /** Splittable FASTA read: Spark's text source with a custom record
    * separator `">"` — each record is one FASTA entry, and the built-in
    * line reader handles records straddling split boundaries, so a
    * single 30 GB fasta fans out across tasks instead of pinning one
    * (the wholeTextFiles limitation [[read]] has). Header lines are
    * the text up to the first newline; sequence = remaining lines with
    * all whitespace stripped. Assumes '>' appears only as the record
    * marker (the FASTA grammar; a '>' inside a header would split the
    * record — same caveat as every delimiter-based splitter).
    * Gzip inputs still work (decompression forces one task per file). */
  def readSplittable(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", ">").text(path)
    raw.filter(trim(col("value")) =!= "")
      .select(
        trim(substring_index(col("value"), "\n", 1)).as("header"),
        when(instr(col("value"), "\n") === 0, lit(""))
          .otherwise(regexp_replace(
            expr("substring(value, instr(value, '\n') + 1)"), "\\s", ""))
          .as("seq"))
  }

  /** Format (header, seq) rows as FASTA text lines, sequence wrapped at
    * `width` (mirrors the SQL string_agg formatter). */
  def format(df: DataFrame, headerCol: String, seqCol: String, width: Int = 60): DataFrame = {
    val wrapped = regexp_replace(col(seqCol), s"(.{$width})", "$1\n")
    df.select(concat(lit(">"), col(headerCol), lit("\n"),
      regexp_replace(wrapped, "\n$", "")).as("value"))
  }

  /** Write FASTA (one text part per partition; coalesce upstream for a
    * single file). */
  def write(df: DataFrame, headerCol: String, seqCol: String, path: String): Unit =
    format(df, headerCol, seqCol).write.mode("overwrite").text(path)
}
