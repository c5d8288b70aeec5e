package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.io.{BufferedOutputStream, File, FileInputStream, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import org.tukaani.xz.{SeekableFileInputStream, SeekableXZInputStream, XZInputStream}

/** S5 — xz feed chunker. The reference downloads the GISAID
  * `provision.json.xz` and streams it through one xz pipe
  * (`gisaid/GisaidApiImporter.java:152-223`), then its R twin chunks
  * before parallelizing (`auto_import_gisaid.R:14-33`). An xz stream is
  * not splittable by byte offset, so a naive `spark.read.json` on a
  * 400 GB feed is ONE task. Two escapes, picked per file:
  *
  *  - **Multi-block xz** (written with `xz -T` or `--block-size`): the
  *    stream index records every block's uncompressed offset, so blocks
  *    decode independently — [[linesBlockParallel]] gives one task per
  *    block with the standard text-split contract (a task owns every
  *    line that STARTS inside its range; the first partial line belongs
  *    to the previous task), no driver pass at all.
  *  - **Single-block xz** (what GISAID actually ships):
  *    [[chunkToFiles]] streams the file once on the driver and spills
  *    N-line jsonl chunk files; the downstream JSON read is then one
  *    task per chunk.
  *
  * [[readJson]] dispatches between them and feeds
  * [[Sources.readJsonWithDriftCheck]] either way. The xz codec is
  * `org.tukaani.xz` — already on Spark's classpath (commons-compress
  * pulls it for Hadoop codecs). Paths must be readable where the
  * decode runs (driver for the chunker, executors for the
  * block-parallel read); on a DFS deployment the seekable stream would
  * wrap FSDataInputStream, which carries the same seek contract.
  */
object XzChunker {

  /** Number of xz blocks (1 = not block-splittable). */
  def blockCount(path: String): Int = {
    val sf = new SeekableFileInputStream(path)
    try new SeekableXZInputStream(sf).getBlockCount
    finally sf.close()
  }

  /** Driver-side stream chunker: decode once, write `linesPerChunk`-line
    * chunk files into `outDir`; returns the chunk paths. Constant
    * memory — one line buffered at a time. */
  def chunkToFiles(xzPath: String, outDir: String, linesPerChunk: Int): Seq[String] = {
    require(linesPerChunk > 0, "linesPerChunk must be positive")
    new File(outDir).mkdirs()
    // a shorter feed re-chunked into the same dir must not leave higher-
    // numbered chunks from a previous run for the glob read to ingest
    Option(new File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("chunk-") && f.getName.endsWith(".jsonl"))
      .foreach(_.delete())
    val in = new XZInputStream(new FileInputStream(xzPath))
    val paths = Seq.newBuilder[String]
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8), 1 << 16)
      var line = reader.readLine()
      var chunkIdx = 0
      while (line != null) {
        val path = f"$outDir/chunk-$chunkIdx%05d.jsonl"
        val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
        try {
          var n = 0
          while (line != null && n < linesPerChunk) {
            out.write(line.getBytes(StandardCharsets.UTF_8))
            out.write('\n')
            n += 1
            line = reader.readLine()
          }
        } finally out.close()
        paths += path
        chunkIdx += 1
      }
    } finally in.close()
    paths.result()
  }

  /** Distributed line read of a MULTI-block xz: one task per block,
    * each seeking its block's uncompressed offset via the xz index.
    * Line ownership: a task reads from the first line boundary at-or-
    * after its start offset (offset 0 owns the first line) through the
    * end of the last line that starts before its end offset. */
  def linesBlockParallel(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    val sf = new SeekableFileInputStream(path)
    val (ranges, total) =
      try {
        val xz = new SeekableXZInputStream(sf)
        val starts = (0 until xz.getBlockCount).map(xz.getBlockPos)
        (starts.zip(starts.drop(1) :+ xz.length()), xz.length())
      } finally sf.close()
    require(total > 0 || ranges.isEmpty, s"empty xz index for $path")
    // parallelize slices one range per partition — repartition would
    // hash ranges into arbitrary partitions (and add a shuffle)
    val rdd = spark.sparkContext.parallelize(ranges, ranges.size.max(1))
      .flatMap { case (start, end) => decodeRange(path, start, end) }
    spark.createDataset(rdd)
  }

  /** Decode the lines owned by [start, end) — runs on an executor. */
  private def decodeRange(path: String, start: Long, end: Long): Iterator[String] = {
    val sf = new SeekableFileInputStream(path)
    val xz = new SeekableXZInputStream(sf)
    // close on task end even if the iterator is abandoned (e.g. limit)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => xz.close()))
    // Non-first tasks begin at start-1 and discard one line — the line
    // CONTAINING byte start-1. If that byte is the previous line's
    // '\n', the discard consumes exactly it and the line starting AT
    // `start` is kept; seeking to `start` and discarding would instead
    // lose a line whose start coincides with the block boundary (the
    // previous task stops at pos == end without reading it).
    val readFrom = if (start > 0) start - 1 else 0L
    xz.seek(readFrom)
    val in: InputStream = new java.io.BufferedInputStream(xz, 1 << 16)
    var pos = readFrom
    def readLine(): String = {
      // manual line scan so `pos` tracks the exact uncompressed offset
      // (a Reader's internal buffering would run ahead of it)
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
      if (b == '\n') pos += 1
      val bytes = buf.toByteArray
      val len = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
      new String(bytes, 0, len, StandardCharsets.UTF_8)
    }
    if (start > 0) readLine() // discard the line containing byte start-1
    new Iterator[String] {
      private var nextLine: String = advance()
      private def advance(): String = if (pos < end) readLine() else { xz.close(); null }
      override def hasNext: Boolean = nextLine != null
      override def next(): String = { val l = nextLine; nextLine = advance(); l }
    }
  }

  /** S5 entry point: xz JSON-lines feed → drift-checked DataFrame.
    * Multi-block files read block-parallel with no driver pass;
    * single-block files are chunked through `workDir` first. */
  def readJson(spark: SparkSession, xzPath: String, workDir: String,
      required: Set[String], expected: Set[String], linesPerChunk: Int = 100000)
      : (DataFrame, Sources.DriftReport) = {
    if (blockCount(xzPath) > 1) {
      val df = spark.read.json(linesBlockParallel(spark, xzPath))
      val fields = df.schema.fieldNames.toSet
      (df, Sources.DriftReport(
        missingRequired = (required -- fields).toSeq.sorted,
        missingExpected = (expected -- fields -- required).toSeq.sorted,
        unexpected = (fields -- required -- expected).toSeq.sorted))
    } else {
      val chunks = chunkToFiles(xzPath, workDir, linesPerChunk)
      // a zero-line feed writes no chunks and the glob would throw
      // PATH_NOT_FOUND — materialize one empty chunk so the read
      // yields an empty frame and the drift check reports cleanly
      if (chunks.isEmpty)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$workDir/chunk-00000.jsonl"), Array.emptyByteArray)
      Sources.readJsonWithDriftCheck(spark, s"$workDir/chunk-*.jsonl", required, expected)
    }
  }
}
