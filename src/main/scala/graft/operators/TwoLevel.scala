package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The banded two-level exclusive prefix sum — the one seam trick
  * behind every "global cumsum/rank in X order" in the library
  * ([[SequencePacking.pack]] bin starts, [[Sharding.shuffleShards]]
  * shuffled ranks, [[BudgetSelect.select]] budget cursors,
  * [[LengthBatching.batches]] length ranks). A naive
  * `sum()/row_number() over (order by ...)` with no partition clause
  * is ONE task holding the whole corpus; this computes the identical
  * number as:
  *
  *  1. within-BAND running totals — a window PARTITIONED by the band
  *     key, every band in parallel;
  *  2. per-band totals (one row per band) get their own exclusive
  *     running total on the reduced frame — the only unpartitioned
  *     window, over band-count rows;
  *  3. offsets broadcast-join back: global exclusive total = band
  *     offset + (within-band inclusive − own value).
  *
  * Integer math throughout, so the result is bit-identical to the
  * single window the DuckDB oracles run (gate-proven by tx9/tx10, s2,
  * lm2, s6, llm2).
  *
  * REQUIREMENT: `band` must be monotone along the total order `ord`
  * (non-decreasing, or non-increasing with `bandDesc`) so each band's
  * rows are contiguous — e.g. a coarse prefix of the leading sort key
  * (`doc_id div 10000`, `score div 8`, the first hash byte). Integer
  * `div` by a positive width is monotone regardless of sign, so
  * negative sort keys band correctly too. `ord` must be TOTAL (add an
  * id tiebreak): ties would otherwise make per-row exclusive sums
  * partition-order-dependent.
  */
object TwoLevel {

  /** Adds `out` = the exclusive running total of `value` (a LongType
    * column; `lit(1L)` turns the cumsum into a 0-based global rank)
    * over the (band, ord...) order described above. */
  def exclusiveCumsum(df: DataFrame, value: Column, band: Column,
      ord: Seq[Column], out: String, bandDesc: Boolean = false): DataFrame = {
    // NOT a delegation to exclusiveCumsumBy with a constant group: a
    // constant __tl_grp column survives into the seam window's
    // partitionSpec and the plan audits (ShardingSpec /
    // SequencePackingSpec) pin the seam as the ONE unpartitioned
    // window over the band aggregate — keep that exact audited shape.
    val g = df.withColumn("__tl_band", band)
    // step 1: within-band INCLUSIVE running total (parallel across bands)
    val wIn = Window.partitionBy(col("__tl_band")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = g.withColumn("__tl_in", sum(value).over(wIn))
    // step 2: per-band totals → exclusive band offsets (tiny frame)
    val wOff = Window
      .orderBy(if (bandDesc) col("__tl_band").desc else col("__tl_band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("__tl_band")).agg(sum(value).as("__tl_tot"))
      .withColumn("__tl_off", coalesce(sum(col("__tl_tot")).over(wOff), lit(0L)))
      .select(col("__tl_band"), col("__tl_off"))
    // step 3: global exclusive = band offset + (inclusive − own)
    local.join(broadcast(offsets), Seq("__tl_band"))
      .withColumn(out, col("__tl_off") + col("__tl_in") - value)
      .drop("__tl_band", "__tl_in", "__tl_off")
  }

  /** Per-GROUP variant: `out` = the exclusive running total of `value`
    * within each `group`, in (band, ord...) order — i.e. the
    * bit-exact equivalent of `sum(value) over (partition by group
    * order by ord)` exclusive, but with no single task ever holding a
    * whole group. Step 2's only window is PARTITIONED by group over
    * the (group × band) reduced frame — #groups·#bands rows — so a
    * 20-source 100 TB corpus ranks with per-(source, band) parallelism
    * instead of 20 corpus-fraction tasks. Same monotone-band and
    * total-order requirements as [[exclusiveCumsum]], per group. */
  def exclusiveCumsumBy(df: DataFrame, value: Column, group: Column,
      band: Column, ord: Seq[Column], out: String,
      bandDesc: Boolean = false): DataFrame = {
    val g = df.withColumn("__tl_grp", group).withColumn("__tl_band", band)
    // step 1: within-(group, band) INCLUSIVE running total
    val wIn = Window.partitionBy(col("__tl_grp"), col("__tl_band")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = g.withColumn("__tl_in", sum(value).over(wIn))
    // step 2: per-(group, band) totals → exclusive band offsets within
    // the group (reduced frame, window partitioned by group)
    val wOff = Window.partitionBy(col("__tl_grp"))
      .orderBy(if (bandDesc) col("__tl_band").desc else col("__tl_band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("__tl_grp"), col("__tl_band")).agg(sum(value).as("__tl_tot"))
      .withColumn("__tl_off", coalesce(sum(col("__tl_tot")).over(wOff), lit(0L)))
      .select(col("__tl_grp"), col("__tl_band"), col("__tl_off"))
    // step 3: exclusive-within-group = band offset + (inclusive − own)
    local.join(broadcast(offsets), Seq("__tl_grp", "__tl_band"))
      .withColumn(out, col("__tl_off") + col("__tl_in") - value)
      .drop("__tl_grp", "__tl_band", "__tl_in", "__tl_off")
  }
}
