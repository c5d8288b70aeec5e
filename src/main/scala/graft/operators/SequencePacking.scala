package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step after chunking: concatenate
  * the token stream of all chunks in a fixed deterministic order and cut
  * it into fixed-size context windows ("bins"). Each chunk's bin is
  * `floor(exclusive-running-total(n_tokens) / window)`: chunks never
  * reorder, a chunk that straddles a boundary spills into the next bin
  * (the concat-and-cut packing used for LLM pretraining batches), and
  * the whole assignment is a pure function of the input order — so it is
  * reproducible run-to-run and oracle-expressible as one SQL window.
  *
  * Scale shape: a naive `sum() over (order by ...)` with no partition
  * clause is ONE task holding the whole corpus — the classic global-
  * cumsum trap. This implementation computes the identical number as a
  * two-level prefix sum:
  *
  *  1. within-GROUP running totals (`group` = a coarse key like
  *     `doc_id div 10000`), a window PARTITIONED by group — every group
  *     runs in parallel;
  *  2. per-group totals (one row per group — corpus-size / group-size,
  *     tiny) get their own exclusive running total, the group's global
  *     offset, on the reduced frame;
  *  3. offsets broadcast-join back; global start = group offset +
  *     within-group exclusive cumsum. Integer math throughout, so the
  *     two-level sum is bit-identical to the single window.
  *
  * At 100 TB only step 2's frame is small-and-ordered; steps 1 and 3 are
  * embarrassingly parallel. (Cf. the reference's chunk-then-parallelize
  * import loop, `database/R/automation/auto_import_gisaid.R:14-33` —
  * same pattern: a sequential seam reduced to negligible size.)
  */
object SequencePacking {

  /** Assign bins over `chunks`. Ordering is (ordCols...), which MUST be
    * a total order consistent with `groupExpr` (rows of one group
    * contiguous under it — e.g. group = doc_id div N, order =
    * (doc_id, chunk_idx)). Adds `bin_id` (the window the chunk STARTS
    * in) and `bin_off` (its token offset inside that window).
    */
  def pack(chunks: DataFrame, tokenCol: String, window: Int,
      groupExpr: Column, ordCols: Seq[String]): DataFrame = {
    require(window > 0, "window must be positive")
    TwoLevel.exclusiveCumsum(chunks, col(tokenCol), groupExpr,
        ordCols.map(col), "__start")
      .withColumn("bin_id", expr(s"__start div $window"))
      .withColumn("bin_off", col("__start") % window)
      .drop("__start")
  }

  /** Bin summary: rows/tokens landed per window (a straight groupBy on
    * the packed frame — shuffle keyed by bin, no global seam). A bin's
    * token count can exceed `window` only for its boundary-straddling
    * last chunk; `spilled = max(0, bin_end − window_end)` tokens of it
    * belong to the next window at materialization time. */
  def binStats(packed: DataFrame, tokenCol: String, window: Int): DataFrame =
    packed.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col(tokenCol)).as("n_tokens"),
        min(col("bin_off")).as("first_off"))
      .withColumn("spilled",
        greatest(col("first_off") + col("n_tokens") - window, lit(0L)))
      .drop("first_off")

  /** Materialize the packed windows: one output row per bin carrying
    * the chunks' text concatenated in stream order — the frame a
    * training loader actually consumes. One shuffle keyed by bin_id;
    * in-bin ordering is reconstructed with an array sort over the
    * collected (ordCols..., text) structs, so the result is
    * partitioning-independent (bins are small — ≤ window/min_chunk
    * chunks — so the per-group collect is bounded by construction). */
  def materializeBins(packed: DataFrame, textCol: String, tokenCol: String,
      ordCols: Seq[String]): DataFrame = {
    val rowStruct = struct((ordCols :+ textCol).map(col): _*)
    packed.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col(tokenCol)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(rowStruct)), x => x.getField(textCol)),
          " ").as("bin_text"))
  }
}
