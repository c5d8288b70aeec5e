package graft.genomics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** D12 — release-eligibility annotator.
  *
  * Re-expresses `database/R/export_spsp_submission.R:142-303`: the
  * per-sequence `qc_result` is rewritten by an ORDERED case ladder
  * (first matching reason wins) after computing a duplicate index
  * within (ethid, first_pass_no_fail) ordered by `consensus_n` (W4):
  *
  *  1. batch not finalized
  *  2. manual hold (`release_decision` true)
  *  3. ethid already released/submitted
  *  4. no metadata
  *  5. passing but null ethid
  *  6. passing but less-complete duplicate (duplicate_idx > 1)
  *  7. server/DB sequence discrepancy
  *  8. otherwise: the original qc_result
  *
  * Flag inputs (released / has-metadata / discrepancies / finalized &
  * incomplete batches) arrive as key frames and become semi/anti-join
  * boolean columns — no driver-side `%in%` lists, so the annotator
  * scales to any table size.
  */
object ReleaseEligibility {

  val NO_FAIL = "no fail reason"

  /** @param sequences (sample_name, ethid, sequencing_batch, qc_result,
    *                  consensus_n, release_decision)
    * @param finalizedBatches (sequencing_batch)
    * @param incompleteBatches (sequencing_batch)
    * @param released (ethid)
    * @param hasMetadata (ethid)
    * @param seqDiscrepancies (sample_name)
    */
  def annotate(sequences: DataFrame, finalizedBatches: DataFrame,
      incompleteBatches: DataFrame, released: DataFrame,
      hasMetadata: DataFrame, seqDiscrepancies: DataFrame): DataFrame = {

    // Null-safe membership (<=>): R's `NA %in% keys` is TRUE iff keys
    // contain NA — a null ethid "has metadata" only when test_metadata
    // itself holds a null ethid. A plain equi-join would silently
    // diverge from the reference on null keys.
    def flag(df: DataFrame, keys: DataFrame, keyCol: String, name: String): DataFrame = {
      val k = keys.select(col(keyCol).as(s"__k_$name")).distinct()
        .withColumn(s"__m_$name", lit(true))
      df.join(k, col(keyCol) <=> col(s"__k_$name"), "left")
        .withColumn(name, coalesce(col(s"__m_$name"), lit(false)))
        .drop(s"__k_$name", s"__m_$name")
    }

    val flagged = Seq(
      (finalizedBatches, "sequencing_batch", "batch_finalized"),
      (incompleteBatches, "sequencing_batch", "batch_incomplete"),
      (released, "ethid", "ethid_released"),
      (hasMetadata, "ethid", "has_metadata"),
      (seqDiscrepancies, "sample_name", "seq_discrepancy"))
      .foldLeft(sequences) { case (df, (keys, keyCol, name)) => flag(df, keys, keyCol, name) }

    val firstPass = col("qc_result") === NO_FAIL
    val w = Window.partitionBy(col("ethid"), firstPass)
      .orderBy(col("consensus_n").asc, col("sample_name").asc)

    flagged
      .withColumn("duplicate_idx", row_number().over(w))
      .withColumn("qc_result_annotated",
        when(!col("batch_finalized"),
          "sequencing batch not finalized according to table sequencing_batch_status")
        .when(col("release_decision"), "column release_decision in consensus_sequence is true")
        .when(col("ethid_released"), "ethid already released or submitted")
        .when(!col("has_metadata"), "no metadata in test_metadata")
        .when(firstPass && col("ethid").isNull, "null ethid")
        .when(firstPass && col("duplicate_idx") > 1, "less complete duplicate")
        .when(col("seq_discrepancy"), "sequence discrepency between D-BSSE server and database")
        .otherwise(col("qc_result")))
      .withColumn("warning_reason",
        when(col("batch_incomplete"), "data from batch not completely loaded into database"))
      .drop("batch_finalized", "batch_incomplete", "ethid_released", "has_metadata", "seq_discrepancy")
  }

  /** The release set: annotated rows still passing. */
  def toRelease(annotated: DataFrame): DataFrame =
    annotated.filter(col("qc_result_annotated") === NO_FAIL)
}
