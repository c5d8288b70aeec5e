package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Length-bucketed batching — the loader-side op that pairs with
  * sequence packing: deal documents into fixed-size batches in token-
  * length order, so every batch holds near-equal-length rows and the
  * padding to the batch max (what a non-packing training/inference
  * loader actually pads to) is minimal. The assignment is a pure
  * function of the id set: global rank under (n_tokens ASC, id ASC),
  * batch = rank div batchSize, position = rank mod batchSize.
  *
  * Scale shape: the global length-ordered rank is the [[Sharding]]
  * two-level prefix sum keyed by LENGTH BAND (`n_tokens div
  * bandWidth`, monotone in the order → bands contiguous): within-band
  * row_numbers parallelize across bands, the offset seam is one row
  * per band, and the result is bit-identical to the naive global
  * window the oracle runs.
  */
object LengthBatching {

  /** Adds `batch_id` and `batch_pos` (both BIGINT) to `docs` under the
    * (tokenCol ASC, idCol ASC) global order. */
  def batches(docs: DataFrame, idCol: String, tokenCol: String,
      batchSize: Int, bandWidth: Long = 16L): DataFrame = {
    require(batchSize > 0 && bandWidth > 0, "batchSize and bandWidth must be positive")
    TwoLevel.exclusiveCumsum(docs, lit(1L), expr(s"$tokenCol div $bandWidth"),
        Seq(col(tokenCol).asc, col(idCol).asc), "__rank")
      .withColumn("batch_id", expr(s"__rank div $batchSize"))
      .withColumn("batch_pos", col("__rank") % batchSize)
      .drop("__rank")
  }

  /** Per-batch padding report: rows, token span, and `pad_tokens` =
    * rows·max − Σtokens — the waste a pad-to-batch-max loader eats.
    * One shuffle keyed by batch. */
  def padStats(batched: DataFrame, tokenCol: String): DataFrame =
    batched.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(tokenCol)).as("min_tokens"),
        max(col(tokenCol)).as("max_tokens"),
        sum(col(tokenCol)).as("__sum"))
      .withColumn("pad_tokens", col("n_rows") * col("max_tokens") - col("__sum"))
      .drop("__sum")
}

/** Length-batching gate. q_s6: every document dealt into 16-row
  * batches in token-length order; `(batch_id, batch_pos)` replayed by
  * the oracle's naive global rank window. */
object LengthBatchingQueries extends QueryModule {

  private val BatchSize = 16

  private val s6 = Q(
    "q_s6_length_batches",
    s"length-bucketed batching: $BatchSize-row batches in token-length order, minimal pad-to-max",
    (s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      LengthBatching.batches(t, "doc_id", "n_tokens", BatchSize)
        .select(col("doc_id"), col("n_tokens"), col("batch_id"), col("batch_pos"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      r AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens ASC, doc_id ASC) - 1 AS rk
        FROM t)
      SELECT doc_id, n_tokens,
             CAST(rk // $BatchSize AS BIGINT) AS batch_id,
             CAST(rk % $BatchSize AS BIGINT) AS batch_pos
      FROM r ORDER BY doc_id"""))

  override val all: Seq[Q] = Seq(s6)
}
