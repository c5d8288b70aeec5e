package graft.sources

import graft.SparkSpec
import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import org.tukaani.xz.{LZMA2Options, XZOutputStream}

/** S5 xz feed: the chunker must make an unsplittable stream read
  * multi-task, and the block-parallel path must honor the text-split
  * line-ownership contract across block boundaries.
  */
class XzChunkerSpec extends SparkSpec {

  private def jsonLines(n: Int): Seq[String] =
    (0 until n).map(i => s"""{"covv_accession_id":"EPI_$i","covv_virus_name":"hCoV-19/test-$i","n":$i}""")

  private def writeSingleBlockXz(path: String, lines: Seq[String]): Unit = {
    val out = new XZOutputStream(new FileOutputStream(path), new LZMA2Options(1))
    out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    out.finish(); out.close()
  }

  /** Multi-block xz with block boundaries deliberately MID-line: every
    * `blockEvery` bytes-ish we endBlock() regardless of line position,
    * so the parallel reader must stitch boundary-spanning lines. */
  private def writeMultiBlockXz(path: String, lines: Seq[String], blockEvery: Int): Int = {
    val out = new XZOutputStream(new FileOutputStream(path), new LZMA2Options(1))
    var sinceBlock = 0
    var blocks = 1
    lines.foreach { l =>
      val bytes = (l + "\n").getBytes(StandardCharsets.UTF_8)
      // split the line's bytes across a block boundary when due
      if (sinceBlock >= blockEvery) {
        val half = bytes.length / 2
        out.write(bytes, 0, half)
        out.endBlock(); blocks += 1
        out.write(bytes, half, bytes.length - half)
        sinceBlock = bytes.length - half
      } else {
        out.write(bytes)
        sinceBlock += bytes.length
      }
    }
    out.finish(); out.close()
    blocks
  }

  test("single-block xz: chunker yields a multi-task drift-checked read equal to its plain twin") {
    val dir = java.nio.file.Files.createTempDirectory("xz1").toString
    val lines = jsonLines(250)
    writeSingleBlockXz(s"$dir/feed.json.xz", lines)
    val plain = new java.io.PrintWriter(s"$dir/feed.jsonl", "UTF-8")
    lines.foreach(plain.println); plain.close()

    assert(XzChunker.blockCount(s"$dir/feed.json.xz") == 1)
    val (df, drift) = XzChunker.readJson(spark, s"$dir/feed.json.xz", s"$dir/chunks",
      required = Set("covv_accession_id", "covv_virus_name"), expected = Set("n"),
      linesPerChunk = 60)
    assert(!drift.fatal && drift.unexpected.isEmpty)
    // 250 lines / 60 per chunk = 5 chunk files → >1 input task
    assert(new java.io.File(s"$dir/chunks").listFiles().count(_.getName.endsWith(".jsonl")) == 5)
    assert(df.rdd.getNumPartitions > 1, "chunked read must be multi-task")
    val (twin, _) = Sources.readJsonWithDriftCheck(spark, s"$dir/feed.jsonl",
      Set("covv_accession_id", "covv_virus_name"), Set("n"))
    assert(df.orderBy("n").collect().toSeq == twin.orderBy("n").collect().toSeq)
  }

  test("multi-block xz: block-parallel read stitches boundary-spanning lines exactly") {
    val dir = java.nio.file.Files.createTempDirectory("xz2").toString
    val lines = jsonLines(400)
    val blocks = writeMultiBlockXz(s"$dir/feed.json.xz", lines, blockEvery = 2000)
    assert(blocks > 3, s"fixture should be genuinely multi-block, got $blocks")
    assert(XzChunker.blockCount(s"$dir/feed.json.xz") == blocks)

    val ds = XzChunker.linesBlockParallel(spark, s"$dir/feed.json.xz")
    assert(ds.rdd.getNumPartitions == blocks, "one task per xz block")
    assert(ds.collect().toSeq == lines, "every line exactly once, in order")
  }

  test("multi-block xz: a block boundary exactly on a line start loses no line") {
    // uniform-length lines + endBlock() exactly after a newline: the
    // boundary line starts precisely at a block's uncompressed offset —
    // the case where skip-first-line logic silently drops it
    val dir = java.nio.file.Files.createTempDirectory("xzb").toString
    val lines = (0 until 100).map(i => f"{'n':$i%04d}".replace('\'', '"'))
    val out = new XZOutputStream(new java.io.FileOutputStream(s"$dir/feed.json.xz"),
      new LZMA2Options(1))
    lines.zipWithIndex.foreach { case (l, i) =>
      out.write((l + "\n").getBytes(StandardCharsets.UTF_8))
      if ((i + 1) % 25 == 0 && i + 1 < lines.size) out.endBlock() // boundary AT line start
    }
    out.finish(); out.close()
    assert(XzChunker.blockCount(s"$dir/feed.json.xz") == 4)
    val got = XzChunker.linesBlockParallel(spark, s"$dir/feed.json.xz").collect().toSeq
    assert(got == lines, s"missing: ${lines.diff(got)}; extra: ${got.diff(lines)}")
  }

  test("re-chunking a shorter feed clears stale higher-numbered chunks") {
    val dir = java.nio.file.Files.createTempDirectory("xzs").toString
    writeSingleBlockXz(s"$dir/big.json.xz", jsonLines(250))
    writeSingleBlockXz(s"$dir/small.json.xz", jsonLines(70))
    XzChunker.chunkToFiles(s"$dir/big.json.xz", s"$dir/chunks", 60)   // 5 chunks
    XzChunker.chunkToFiles(s"$dir/small.json.xz", s"$dir/chunks", 60) // 2 chunks
    val files = new java.io.File(s"$dir/chunks").listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    assert(files.length == 2, s"stale chunks survived: ${files.map(_.getName).sorted.toSeq}")
    val (df, _) = Sources.readJsonWithDriftCheck(spark, s"$dir/chunks/chunk-*.jsonl",
      Set("covv_accession_id"), Set())
    assert(df.count() == 70)
  }

  test("multi-block xz: readJson dispatches to the block-parallel path") {
    val dir = java.nio.file.Files.createTempDirectory("xz3").toString
    val lines = jsonLines(120)
    writeMultiBlockXz(s"$dir/feed.json.xz", lines, blockEvery = 1500)
    val (df, drift) = XzChunker.readJson(spark, s"$dir/feed.json.xz", s"$dir/unused",
      required = Set("covv_accession_id"), expected = Set("covv_virus_name", "n"))
    assert(!drift.fatal)
    assert(df.count() == 120)
    // the work dir must be untouched — no driver-side chunk pass happened
    assert(!new java.io.File(s"$dir/unused").exists())
  }

  test("multi-block readJson: schema from the head sample, ONE distributed decode pass") {
    val dir = java.nio.file.Files.createTempDirectory("xz5").toString
    val lines = jsonLines(300)
    val blocks = writeMultiBlockXz(s"$dir/feed.json.xz", lines, blockEvery = 1500)
    XzChunker.blockDecodeTasks.set(0)
    val (df, drift) = XzChunker.readJson(spark, s"$dir/feed.json.xz", s"$dir/unused",
      required = Set("covv_accession_id"), expected = Set("covv_virus_name", "n"))
    assert(!drift.fatal && drift.unexpected.isEmpty)
    // schema came from the bounded head sample — building the frame ran
    // NO distributed decode (full-feed inference would have run one)
    assert(XzChunker.blockDecodeTasks.get() == 0,
      "schema inference must not decode the feed")
    assert(df.schema.fieldNames.sorted.toSeq ==
      Seq("covv_accession_id", "covv_virus_name", "n"))
    assert(df.count() == 300)
    assert(XzChunker.blockDecodeTasks.get() == blocks,
      "the action itself is the only full decode, one task per block")
  }

  test("single-block staging: re-reads skip the driver decode and survive feed rotation") {
    val dir = java.nio.file.Files.createTempDirectory("xz6").toString
    val xz = s"$dir/feed.json.xz"
    writeSingleBlockXz(xz, jsonLines(250))
    XzChunker.driverChunkPasses.set(0)
    val req = Set("covv_accession_id"); val exp = Set("covv_virus_name", "n")

    val (df1, _) = XzChunker.readJson(spark, xz, s"$dir/chunks", req, exp, linesPerChunk = 60)
    assert(df1.count() == 250)
    assert(XzChunker.driverChunkPasses.get() == 1, "first read pays the one serial pass")

    // second read: staged — no driver decode, still multi-task
    val (df2, drift2) = XzChunker.readJson(spark, xz, s"$dir/chunks", req, exp, linesPerChunk = 60)
    assert(XzChunker.driverChunkPasses.get() == 1, "re-read must not re-decode on the driver")
    assert(!drift2.fatal && df2.rdd.getNumPartitions > 1 && df2.count() == 250)

    // the source rotates away: the staging keeps serving reads
    assert(new java.io.File(xz).delete())
    val (df3, _) = XzChunker.readJson(spark, xz, s"$dir/chunks", req, exp, linesPerChunk = 60)
    assert(XzChunker.driverChunkPasses.get() == 1)
    assert(df3.count() == 250)

    // a CHANGED feed at the same path re-stages exactly once
    writeSingleBlockXz(xz, jsonLines(70))
    new java.io.File(xz).setLastModified(System.currentTimeMillis() + 5000)
    val (df4, _) = XzChunker.readJson(spark, xz, s"$dir/chunks", req, exp, linesPerChunk = 60)
    assert(XzChunker.driverChunkPasses.get() == 2, "changed source must re-stage")
    assert(df4.count() == 70)
  }

  test("drift check: a missing required field is fatal") {
    val dir = java.nio.file.Files.createTempDirectory("xz4").toString
    writeSingleBlockXz(s"$dir/feed.json.xz", jsonLines(10))
    val (_, drift) = XzChunker.readJson(spark, s"$dir/feed.json.xz", s"$dir/chunks",
      required = Set("not_there"), expected = Set())
    assert(drift.fatal && drift.missingRequired == Seq("not_there"))
  }
}
