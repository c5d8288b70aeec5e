package graft.genomics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** D2 — "80% rule" variant caller.
  *
  * Re-expresses `database/sql/consensus_sequence.sql:78-137` (also
  * `gisaid.sql:170-254`): cross join sequences × (tiny, broadcast)
  * variant mutation definitions (`'C913T'` = original, 1-indexed
  * position, mutated base), classify the sample base at each defining
  * position:
  *   '-' original base, '+' mutated base, '?' N/unknown, '!' other,
  * then per sample: variant confirmed iff confirmed ≥ 0.8 × |defs|,
  * callable iff (confirmed + original + weird) ≥ 0.8 × |defs|.
  */
object VariantCaller {

  /** Per (sample × def) classification states.
    *
    * Batched site extraction: the defining positions are pulled in ONE
    * `extract_sites` call per sequence (O(defs) byte lookups — a
    * per-def `substring(seq, position, 1)` costs O(position) each on
    * UTF8String, i.e. O(defs·len) per row), then posexplode joins the
    * (tiny, broadcast) indexed def table. Same (sample × def) output
    * as the cross-join form. */
  def states(sequences: DataFrame, defs: DataFrame, idCol: String, seqCol: String,
      mutCol: String): DataFrame = {
    val spark = sequences.sparkSession
    graft.functions.SeqExpressions.register(spark)
    import spark.implicits._
    val d = defs.select(
      upper(substring(col(mutCol), 1, 1)).as("original"),
      expr(s"cast(substring($mutCol, 2, char_length($mutCol) - 2) as int)").as("position"),
      upper(substring(col(mutCol), -1, 1)).as("mutated"))
      .collect() // tiny definition table by contract (≤ ~30 rows)
    val posArr = array(d.map(r => lit(r.getAs[Int]("position"))).toSeq: _*)
    val defsIdx = d.zipWithIndex.map { case (r, i) =>
      (i, r.getAs[String]("original"), r.getAs[Int]("position"), r.getAs[String]("mutated"))
    }.toSeq.toDF("idx", "original", "position", "mutated")
    // NULL sequences must still emit one row per def (all '!', like the
    // reference's substring cross join): extract_sites(NULL) is NULL and
    // posexplode would drop the sample entirely, so coalesce to '' —
    // every position is then out-of-range → '' site → '!' state.
    sequences.select(col(idCol),
        posexplode(call_function("extract_sites", coalesce(col(seqCol), lit("")), posArr))
          .as(Seq("idx", "site")))
      .join(broadcast(defsIdx), "idx")
      .withColumn("base", upper(col("site")))
      .withColumn("mutation_state",
        when(col("base") === col("original"), "-")
          .when(col("base") === col("mutated"), "+")
          .when(col("base") === "N", "?")
          .otherwise("!"))
      .drop("idx", "site")
  }

  /** Per-sample call: (id, confirmed, original, unknown, weird,
    * is_variant, callable) with the 0.8 threshold. */
  def call(sequences: DataFrame, defs: DataFrame, idCol: String, seqCol: String,
      mutCol: String, threshold: Double = 0.8): DataFrame = {
    val nDefs = defs.count() // tiny definition table (≤ ~30 rows)
    states(sequences, defs, idCol, seqCol, mutCol)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("mutation_state") === "+", 1L).otherwise(0L)).as("confirmed"),
        sum(when(col("mutation_state") === "-", 1L).otherwise(0L)).as("original"),
        sum(when(col("mutation_state") === "?", 1L).otherwise(0L)).as("unknown"),
        sum(when(col("mutation_state") === "!", 1L).otherwise(0L)).as("weird"))
      .withColumn("is_variant", col("confirmed") >= lit(threshold * nDefs))
      .withColumn("callable",
        (col("confirmed") + col("original") + col("weird")) >= lit(threshold * nDefs))
  }
}
