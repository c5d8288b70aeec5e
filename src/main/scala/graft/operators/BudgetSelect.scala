package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — the step that turns a scored corpus
  * into a fixed-size training set: admit documents in quality order
  * (best first) until the token budget fills. The rule is exact and
  * deterministic: a document is selected iff the cumulative token count
  * of all strictly-better documents (score DESC, id ASC tiebreak) is
  * below the budget — "fill until full"; the boundary-straddling
  * document is admitted, every later one rejected. Used to build
  * compute-matched training mixes (e.g. the "token budget" regimes of
  * Hoffmann et al. 2022) from a quality-ranked pool.
  *
  * Scale shape: the global quality-ordered cumsum is the
  * [[SequencePacking]] two-level prefix sum, re-keyed by SCORE BAND
  * (`score div bandWidth`): bands are contiguous under the score-desc
  * total order (band is monotone in score, and equal scores — the only
  * in-band tiebreak — cannot cross bands), so within-band running
  * totals parallelize across bands, only the one-row-per-band offset
  * frame is globally ordered, and the two-level number is bit-identical
  * to the naive single window the DuckDB oracle runs. No corpus-sized
  * single-task window anywhere.
  */
object BudgetSelect {

  /** Adds `cum_before` (tokens admitted strictly before this doc in
    * (scoreCol DESC, idCol ASC) order) and `selected` (1 iff
    * cum_before < budget) to `docs`. Integer columns only. */
  def select(docs: DataFrame, idCol: String, scoreCol: String, tokenCol: String,
      budget: Long, bandWidth: Long = 8L): DataFrame = {
    require(budget >= 0 && bandWidth > 0, "budget and bandWidth must be non-negative")
    val g = docs.withColumn("__band", expr(s"$scoreCol div $bandWidth"))
    // step 1: within-band inclusive running total (parallel across bands)
    val wIn = Window.partitionBy(col("__band"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = g.withColumn("__cum_in", sum(col(tokenCol)).over(wIn))
    // step 2: per-band totals → exclusive offsets in band-DESC order
    // (one row per band — tiny)
    val wOff = Window.orderBy(col("__band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("__band")).agg(sum(col(tokenCol)).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wOff), lit(0L)))
      .select(col("__band"), col("__boff"))
    // step 3: global exclusive cumsum = band offset + (inclusive − own)
    local.join(broadcast(offsets), Seq("__band"))
      .withColumn("cum_before", col("__boff") + col("__cum_in") - col(tokenCol))
      .withColumn("selected", (col("cum_before") < budget).cast("long"))
      .drop("__band", "__cum_in", "__boff")
  }
}
