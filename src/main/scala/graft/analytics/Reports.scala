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

  /** Dashboard main view (ref `database/init.sql:783-902`,
    * `dashboard_main_view`): canton → Grossregion recode (reference
    * labels, incl. FL), age-group bucketing for positives, union with
    * `bag_test_numbers` where each row carries its own `age_group`
    * (spaces stripped, `init.sql:896`) and a `negative_tests` count
    * used as the multiplier (`init.sql:897-898` `mult`) — negatives
    * are a counts table, NOT one row per test. Optional armee
    * carve-out applies only when the positives input carries an
    * `is_armee` marker (derived upstream from the
    * `auftraggeber_armee=TRUE` comment, `bag_sequence_report.sql:14`);
    * the reference's raw view keeps armee rows, so absence of the
    * column means no filtering. */
  def dashboardMainView(cases: DataFrame, negatives: DataFrame): DataFrame = {
    val grossregion = when(col("canton").isin("GE", "VD", "VS"), "Lake Geneva region")
      .when(col("canton").isin("BE", "SO", "FR", "NE", "JU"), "Espace Mittelland")
      .when(col("canton").isin("BS", "BL", "AG"), "Grossregion Nordwestschweiz")
      .when(col("canton") === "ZH", "Grossregion Zurich")
      .when(col("canton").isin("SG", "TG", "AI", "AR", "GL", "SH", "GR"), "Ostschweiz")
      .when(col("canton").isin("UR", "SZ", "OW", "NW", "LU", "ZG"), "Central Switzerland")
      .when(col("canton") === "TI", "Grossregion Tessin")
      .when(col("canton") === "FL", "Fürstentum Liechtenstein")
      .otherwise("Unknown")
    val ageGroup =
      when(col("age").isNull, "Unknown")
        .when(col("age") < 10, "0-9").when(col("age") < 20, "10-19")
        .when(col("age") < 30, "20-29").when(col("age") < 40, "30-39")
        .when(col("age") < 50, "40-49").when(col("age") < 60, "50-59")
        .when(col("age") < 70, "60-69").when(col("age") < 80, "70-79")
        .otherwise("80+")
    val posBase =
      if (cases.columns.contains("is_armee"))
        cases.filter(!coalesce(col("is_armee"), lit(false)))
      else cases
    val posBranch = posBase.select(
      col("date"), col("canton"), ageGroup.as("age_group"),
      lit(true).as("positive"), lit(1L).as("mult"))
    val negBranch = negatives.select(
      col("date"), col("canton"),
      coalesce(regexp_replace(col("age_group"), " ", ""), lit("Unknown")).as("age_group"),
      lit(false).as("positive"),
      coalesce(col("negative_tests").cast("long"), lit(0L)).as("mult"))
    posBranch.unionByName(negBranch)
      .withColumn("grossregion", grossregion)
      .groupBy(col("date"), col("grossregion"), col("age_group"), col("positive"))
      .agg(sum(col("mult")).as("n"))
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
