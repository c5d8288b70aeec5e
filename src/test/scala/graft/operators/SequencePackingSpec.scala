package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks = Seq(
    // (doc_id, chunk_idx, n_tokens)
    (1L, 0L, 40L), (1L, 1L, 30L), (2L, 0L, 10L), (2L, 1L, 7L),
    (3L, 0L, 64L), (4L, 0L, 1L), (10L, 0L, 25L), (11L, 0L, 63L),
    (11L, 1L, 2L), (12L, 0L, 40L))
    .toDF("doc_id", "chunk_idx", "n_tokens")

  test("two-level prefix sum matches the single global window bit-for-bit") {
    val packed = SequencePacking.pack(chunks, "n_tokens", 64,
      expr("doc_id div 3"), Seq("doc_id", "chunk_idx"))
    val wGlobal = Window.orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = chunks
      .withColumn("s", coalesce(sum(col("n_tokens")).over(wGlobal), lit(0L)))
      .withColumn("bin_id", expr("s div 64"))
      .withColumn("bin_off", col("s") % 64)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("bin_id"), col("bin_off"))
    val got = packed.orderBy("doc_id", "chunk_idx").collect().toSeq
    val exp = naive.orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(got == exp)
  }

  test("bin ids are non-decreasing in stream order and offsets stay in-window") {
    val rows = SequencePacking.pack(chunks, "n_tokens", 64,
        expr("doc_id div 3"), Seq("doc_id", "chunk_idx"))
      .orderBy("doc_id", "chunk_idx")
      .select("bin_id", "bin_off").collect()
    val bins = rows.map(_.getLong(0))
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getLong(1)).forall(o => o >= 0 && o < 64))
  }

  test("the corpus-sized window is partitioned; only the group seam is global") {
    val packed = SequencePacking.pack(chunks, "n_tokens", 64,
      expr("doc_id div 3"), Seq("doc_id", "chunk_idx"))
    val windows = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // exactly one unpartitioned window, and it runs over the REDUCED
    // per-group frame (an Aggregate beneath it), never the chunk scan
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.size == 1, s"expected 1 seam window, got ${windows.size}")
    assert(global.head.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "global window must sit on the per-group aggregate, not the corpus")
  }

  test("materializeBins renders windows in stream order, independent of partitioning") {
    val c = Seq((1L, 0L, "a b c", 3L), (1L, 1L, "d e", 2L), (2L, 0L, "f g h i", 4L),
      (3L, 0L, "j", 1L), (9L, 0L, "k l m", 3L))
      .toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens")
    def run(parts: Int) = SequencePacking.materializeBins(
        SequencePacking.pack(c.repartition(parts), "n_tokens", 5,
          expr("doc_id div 2"), Seq("doc_id", "chunk_idx")),
        "chunk_text", "n_tokens", Seq("doc_id", "chunk_idx"))
      .orderBy("bin_id").collect().toSeq
    val one = run(1)
    assert(one == run(7), "bin text must not depend on partitioning")
    // stream: a b c | d e | f g h i | j | k l m  (13 tokens, window 5)
    // starts: 0, 3, 5, 9, 10 → bins 0, 0, 1, 1, 2
    val byBin = one.map(r => r.getAs[Long]("bin_id") ->
      ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens"), r.getAs[String]("bin_text")))).toMap
    assert(byBin(0L) == ((2L, 5L, "a b c d e")))
    assert(byBin(1L) == ((2L, 5L, "f g h i j")))
    assert(byBin(2L) == ((1L, 3L, "k l m")))
  }

  test("binStats reports chunk/token totals and boundary spill per window") {
    // one group, windows of 10: chunks 7+7 straddle, then 3
    val c = Seq((1L, 0L, 7L), (1L, 1L, 7L), (1L, 2L, 3L))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = SequencePacking.pack(c, "n_tokens", 10,
      lit(0L), Seq("doc_id", "chunk_idx"))
    val stats = SequencePacking.binStats(packed, "n_tokens", 10)
      .orderBy("bin_id").collect()
    // bin 0: chunks at start 0 and 7 (second spills 4 into bin 1)
    assert(stats(0).getAs[Long]("bin_id") == 0L)
    assert(stats(0).getAs[Long]("n_chunks") == 2L)
    assert(stats(0).getAs[Long]("n_tokens") == 14L)
    assert(stats(0).getAs[Long]("spilled") == 4L)
    // bin 1: the 3-token chunk starting at offset 4, no spill
    assert(stats(1).getAs[Long]("bin_id") == 1L)
    assert(stats(1).getAs[Long]("n_chunks") == 1L)
    assert(stats(1).getAs[Long]("n_tokens") == 3L)
    assert(stats(1).getAs[Long]("spilled") == 0L)
  }
}
