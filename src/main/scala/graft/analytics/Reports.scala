package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §7.2.6 analytics remainder: QC suites, rankings, report picks —
  * compositions of the covered operator families over the domain
  * tables.
  */
object Reports {

  /** Batch QC counters (ref `database/sql/quality_control.sql:31-44`):
    * per sequencing batch, pivot-style conditional counts + fail rate. */
  def batchQc(consensus: DataFrame): DataFrame =
    consensus.groupBy(col("sequencing_batch"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("fail_reason").isNull, 1L).otherwise(0L)).as("n_passed"),
        sum(when(col("fail_reason").isNotNull, 1L).otherwise(0L)).as("n_failed"),
        sum(when(col("ethid").isNull, 1L).otherwise(0L)).as("n_controls"))
      .withColumn("fail_rate",
        col("n_failed").cast("double") / col("n_total").cast("double"))

  /** Fail-reason rollup with subtotals (ref quality_control.sql:78-83). */
  def failReasonRollup(consensus: DataFrame): DataFrame =
    consensus.filter(col("fail_reason").isNotNull)
      .rollup(col("sequencing_batch"), col("fail_reason"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("sequencing_batch"), lit("ALL")).as("sequencing_batch"),
        coalesce(col("fail_reason"), lit("ALL")).as("fail_reason"),
        col("n"))

  /** Institution ranking by sequence count (ref gisaid.sql:1-8 —
    * join on lower(lab) to merge case variants). */
  def labRanking(gisaid: DataFrame): DataFrame =
    gisaid.groupBy(lower(col("submitting_lab")).as("lab"))
      .agg(count(lit(1)).as("n_sequences"),
        concat_ws("; ", array_sort(collect_set(col("country")))).as("countries"))
      .orderBy(col("n_sequences").desc, col("lab").asc)

  /** Author ranking via explode of the comma-joined author list
    * (ref gisaid.sql:21-31, G1). */
  def authorRanking(articles: DataFrame, authorsCol: String = "authors"): DataFrame =
    articles.select(explode(split(col(authorsCol), ",")).as("author"))
      .select(trim(col("author")).as("author"))
      .filter(col("author") =!= "")
      .groupBy(col("author"))
      .agg(count(lit(1)).as("n_articles"))
      .orderBy(col("n_articles").desc, col("author").asc)

  /** BAG sequence report best-record pick (ref
    * bag_sequence_report.sql:73, 119-120 W3): per ethid, prefer
    * released (gisaid_id non-null), then lowest consensus_n. */
  def bagSequenceReport(consensus: DataFrame, sequenceIdentifier: DataFrame,
      completenessCol: String = "consensus_n"): DataFrame = {
    val w = Window.partitionBy(col("ethid"))
      .orderBy(col("gisaid_id").isNull.asc, col(completenessCol).asc, col("sample_name").asc)
    consensus
      .join(sequenceIdentifier.select(col("sample_name"), col("gisaid_id")), Seq("sample_name"), "left")
      .withColumn("priority_idx", row_number().over(w))
      .filter(col("priority_idx") === 1)
      .drop("priority_idx")
  }

  /** Dashboard main view (ref `database/init.sql:783-948`,
    * `dashboard_main_view`): canton → Grossregion recode, age-group
    * bucketing, cases ∪ null-padded negatives (U1), armee carve-out. */
  def dashboardMainView(cases: DataFrame, negatives: DataFrame): DataFrame = {
    val grossregion = when(col("canton").isin("GE", "VD", "VS"), "Lake Geneva region")
      .when(col("canton").isin("BE", "FR", "JU", "NE", "SO"), "Espace Mittelland")
      .when(col("canton").isin("AG", "BL", "BS"), "Northwestern Switzerland")
      .when(col("canton") === "ZH", "Zurich")
      .when(col("canton").isin("AI", "AR", "GL", "GR", "SG", "SH", "TG"), "Eastern Switzerland")
      .when(col("canton").isin("LU", "NW", "OW", "SZ", "UR", "ZG"), "Central Switzerland")
      .when(col("canton") === "TI", "Ticino")
      .otherwise("Unknown")
    val ageGroup =
      when(col("age") < 10, "0-9").when(col("age") < 20, "10-19")
        .when(col("age") < 30, "20-29").when(col("age") < 40, "30-39")
        .when(col("age") < 50, "40-49").when(col("age") < 60, "50-59")
        .when(col("age") < 70, "60-69").when(col("age") < 80, "70-79")
        .otherwise("80+")
    val posBranch = cases
      .filter(!coalesce(col("is_armee"), lit(false))) // armee carve-out (init.sql:878-880)
      .select(col("date"), col("canton"), col("age"), lit(true).as("positive"))
    val negBranch = negatives
      .select(col("date"), col("canton"), lit(null).cast("int").as("age"), lit(false).as("positive"))
    posBranch.unionByName(negBranch)
      .withColumn("grossregion", grossregion)
      .withColumn("age_group", when(col("age").isNull, "Unknown").otherwise(ageGroup))
      .groupBy(col("date"), col("grossregion"), col("age_group"), col("positive"))
      .agg(count(lit(1)).as("n"))
  }

  /** Pipeline completeness funnel over the sample lifecycle (ref
    * quality_control.sql:46-58): one pass of stage flags. */
  def completenessFunnel(tests: DataFrame, consensus: DataFrame,
      sequenceIdentifier: DataFrame): DataFrame = {
    val seqFlag = consensus.select(col("ethid")).distinct().withColumn("sequenced", lit(true))
    val relFlag = sequenceIdentifier.filter(col("gisaid_id").isNotNull)
      .select(col("ethid")).distinct().withColumn("released", lit(true))
    tests
      .join(seqFlag, Seq("ethid"), "left")
      .join(relFlag, Seq("ethid"), "left")
      .agg(
        count(lit(1)).as("tested"),
        sum(when(col("sequenced"), 1L).otherwise(0L)).as("sequenced"),
        sum(when(col("released"), 1L).otherwise(0L)).as("released"))
  }
}
