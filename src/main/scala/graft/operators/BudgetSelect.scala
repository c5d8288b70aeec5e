package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    require(budget >= 0 && bandWidth > 0,
      "budget must be non-negative and bandWidth positive")
    TwoLevel.exclusiveCumsum(docs, col(tokenCol), expr(s"$scoreCol div $bandWidth"),
        Seq(col(scoreCol).desc, col(idCol).asc), "cum_before", bandDesc = true)
      .withColumn("selected", (col("cum_before") < budget).cast("long"))
  }
}
