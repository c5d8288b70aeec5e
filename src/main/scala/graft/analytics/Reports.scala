package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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

  /** B.1.1.7-vs-wildtype hospitalization/death contingency (ref
    * `b117_analysis.sql:2-62`): best consensus record per ethid
    * (lowest consensus_n, then sample_name — the reference's
    * correlated NOT EXISTS, expressed as a rank-1 window so Spark
    * plans a WindowGroupLimit), an 80%-of-defs variant flag from the
    * (tiny, broadcast) mutation definition list, then an 8-way
    * conditional-sum contingency by age group over the joined test +
    * Meldeformular rows in the date range. */
  def variantContingency(consensus: DataFrame, sampleMutations: DataFrame,
      variantDefs: DataFrame, tests: DataFrame, meldeformular: DataFrame,
      dateFrom: String, dateTo: String): DataFrame = {
    val nDefs = variantDefs.count() // tiny definition list by contract
    val best = consensus
      .withColumn("__rn", row_number().over(Window.partitionBy(col("ethid"))
        .orderBy(col("consensus_n").asc, col("sample_name").asc)))
      .filter(col("__rn") === 1).drop("__rn")
    val matched = sampleMutations
      .join(broadcast(variantDefs.select(col("aa_mutation"))), Seq("aa_mutation"))
      .groupBy(col("sample_name")).agg(count(lit(1)).as("__n_matched"))
    val flagged = best.join(matched, Seq("sample_name"), "left")
      .withColumn("variant",
        coalesce(col("__n_matched"), lit(0L)) >= lit(0.8) * lit(nDefs))
    val samples = tests
      .filter(col("order_date").between(dateFrom, dateTo))
      .join(flagged.select(col("ethid"), col("variant")), Seq("ethid"))
      .join(meldeformular, Seq("sample_number"))
      .select(col("variant"),
        col("altersjahr"),
        coalesce(col("hospitalisation_type") === "HOSPITALIZED", lit(false)).as("hospitalized"),
        coalesce(col("pttod"), lit(false)).as("dead"))
    val ageGroup =
      when(col("altersjahr") < 10, "0-9")
        .when(col("altersjahr") < 20, "10-19").when(col("altersjahr") < 30, "20-29")
        .when(col("altersjahr") < 40, "30-39").when(col("altersjahr") < 50, "40-49")
        .when(col("altersjahr") < 60, "50-59").when(col("altersjahr") < 70, "60-69")
        .when(col("altersjahr") < 80, "70-79")
        .when(col("altersjahr") >= 80, "80+") // null age → null group, like the ref CASE
    def cell(p: Column): Column = sum(when(p, 1L).otherwise(0L))
    samples.groupBy(ageGroup.as("age_group"))
      .agg(
        count(lit(1)).as("total"),
        cell(col("hospitalized") && col("variant")).as("variant_hospitalized"),
        cell(!col("hospitalized") && col("variant")).as("variant_not_hospitalized"),
        cell(col("hospitalized") && !col("variant")).as("not_variant_hospitalized"),
        cell(!col("hospitalized") && !col("variant")).as("not_variant_not_hospitalized"),
        cell(col("dead") && col("variant")).as("variant_dead"),
        cell(!col("dead") && col("variant")).as("variant_not_dead"),
        cell(col("dead") && !col("variant")).as("not_variant_dead"),
        cell(!col("dead") && !col("variant")).as("not_variant_not_dead"))
  }

  /** Omicron candidate sweep (ref `omicron_analysis.sql:1-34`): a
    * sample qualifies by carrying ≥ `minSpikeHits` of the defining
    * spike mutations OR a matching pangolin lineage; candidates are
    * then enriched with test, release-id and lineage context. The
    * mutation list is a literal isin (codegen'd scan predicate, no
    * join); the two candidate sets union DISTINCT like the ref. */
  def omicronCandidates(consensus: DataFrame, sampleMutations: DataFrame,
      nextcladeData: DataFrame, tests: DataFrame, sequenceIdentifier: DataFrame,
      spikeMutations: Seq[String], lineagePattern: String = "^(B\\.1\\.1\\.529|BA).*",
      minSpikeHits: Long = 2L, batch: Option[String] = None): DataFrame = {
    val bySpike = sampleMutations
      .filter(col("aa_mutation").isin(spikeMutations: _*))
      .groupBy(col("sample_name")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSpikeHits)
      .select(col("sample_name"))
    val byLineage = nextcladeData
      .filter(col("pangolin_lineage").rlike(lineagePattern))
      .select(col("sample_name"))
    val candidates = bySpike.union(byLineage).distinct()
    val cs = batch.map(b => consensus.filter(col("sequencing_batch") === b)).getOrElse(consensus)
    candidates
      .join(cs.select(col("sample_name"), col("ethid"), col("sequencing_center")), Seq("sample_name"))
      .join(tests, Seq("ethid"), "left")
      .join(sequenceIdentifier.select(col("sample_name"), col("gisaid_id")), Seq("sample_name"), "left")
      .join(nextcladeData.select(col("sample_name"), col("pangolin_lineage")), Seq("sample_name"), "left")
  }

  /** Close-country absolute-majority share (ref
    * `close_country_analysis.sql:1-37`): sequences of `country` in the
    * given month vote via their close-country neighbor lists; strains
    * with an absolute majority (≥ `minVotes` rows for one close
    * country) are tallied into a rollup with a formatted percentage —
    * the total comes from a one-row broadcast, not a scalar subquery
    * per row. */
  def closeCountryMajority(sequences: DataFrame, closeCountry: DataFrame,
      country: String, yr: Int, mth: Int, minVotes: Long = 6L): DataFrame = {
    val relevant = sequences
      .filter(col("country") === country && year(col("date")) === yr && month(col("date")) === mth)
      .select(col("strain"))
    val majority = relevant.join(closeCountry, Seq("strain"))
      .groupBy(col("strain"), col("close_country"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)
      .select(col("strain"), col("close_country").as("est_country"))
    val total = majority.agg(count(lit(1)).as("__total"))
    majority
      .rollup(col("est_country"))
      .agg(count(lit(1)).as("count"))
      .crossJoin(broadcast(total))
      .select(col("est_country"),
        concat(format_number(col("count") * 100.0 / col("__total"), 2), lit("%")).as("percentage"),
        col("count"))
      .orderBy(col("count").desc)
  }

  /** Close-country monthly origin proportions (ref
    * `close_country_analysis.sql:40-91`): per (estimated country,
    * year, month) counts and their share of the month — the ref's
    * self-join on monthly totals is a window sum over the month
    * partition (one shuffle instead of two). */
  def closeCountryMonthlyProportion(sequences: DataFrame, closeCountry: DataFrame,
      country: String, minVotes: Long = 6L): DataFrame = {
    val relevant = sequences.filter(col("country") === country)
      .select(col("strain"), col("date"))
    val majority = relevant.join(closeCountry, Seq("strain"))
      .groupBy(col("strain"), col("date"), col("close_country"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)
    val monthly = majority
      .groupBy(col("close_country").as("est_country"),
        year(col("date")).as("year"), month(col("date")).as("month"))
      .agg(count(lit(1)).as("count"))
    monthly
      .withColumn("proportion", col("count").cast("double")
        / sum(col("count")).over(Window.partitionBy(col("year"), col("month"))))
      .orderBy(col("year"), col("month"), col("est_country"))
  }

  /** Common nucleotide mutations of a pangolin lineage (ref
    * `database/sql/gisaid_mutations.sql:16-36`): restrict to the
    * lineage's sequences that HAVE mutation rows (the reference's
    * EXISTS — a semi join), count each (position, mutation), keep
    * those at or above `prevNum/prevDen` prevalence (default the
    * reference's 20%). The threshold is integer cross-multiplied so
    * the cut is float-free; `proportion` is emitted for reading, not
    * compared. The denominator is one aggregate row broadcast into
    * the HAVING — the scalar-subquery shape, shuffle-free. */
  def mutationPrevalence(gisaid: DataFrame, nucMutations: DataFrame,
      lineage: String, prevNum: Int = 20, prevDen: Int = 100): DataFrame = {
    val seqs = gisaid.filter(col("pango_lineage") === lineage)
      .select(col("strain"))
      // semi join ignores build-side duplicates — no distinct needed
      .join(nucMutations.select(col("strain")), Seq("strain"), "semi")
      .localCheckpoint() // two consumers (total + join): one computation
    val total = seqs.agg(count(lit(1)).as("n_total"))
    seqs.join(nucMutations, Seq("strain"))
      .groupBy((col("position") + 1).as("position"), col("mutation"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * prevDen >= col("n_total") * prevNum)
      .withColumn("proportion", col("n").cast("double") / col("n_total"))
      .select(col("position"), col("mutation"), col("n"), col("proportion"))
      // mutation tiebreak makes the order total — equal-count rows at
      // the same position would otherwise come back partition-ordered
      .orderBy(col("n").desc, col("position"), col("mutation"))
  }

  /** Datathon host summary (ref `database/sql/aarhus_datathon.sql:1-5`):
    * per host, sequence count and date range for one country. */
  def hostSummary(gisaid: DataFrame, country: String,
      countryCol: String = "country_original"): DataFrame =
    gisaid.filter(col(countryCol) === country)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_sequences"),
        min(col("date")).as("first_date"), max(col("date")).as("last_date"))
      .orderBy(col("host"))

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
