package graft.analytics

import graft.SparkSpec

class ReportsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{lit, to_date}

  private def consensus: DataFrame = {
    import spark.implicits._
    Seq(
      ("s1", Some(1L), "b1", null, 10),
      ("s2", Some(1L), "b1", null, 5),
      ("s3", Some(2L), "b1", "degraded", 99),
      ("s4", None,     "b2", null, 1),
      ("s5", Some(3L), "b2", "low coverage", 50)
    ).map { case (s, e, b, f, n) => (s, e, b, f, n) }
      .toDF("sample_name", "ethid", "sequencing_batch", "fail_reason", "consensus_n")
  }

  test("batch QC counters + fail rate") {
    val out = batchRows
    assert(out("b1") == ((3L, 2L, 1L, 0L)))
    assert(out("b2") == ((2L, 1L, 1L, 1L)))
  }

  private def batchRows = Reports.batchQc(consensus).collect()
    .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("fail-reason rollup has detail + subtotal + grand total") {
    val rows = Reports.failReasonRollup(consensus).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("b1", "degraded", 1L)))
    assert(rows.contains(("b1", "ALL", 1L)))
    assert(rows.contains(("ALL", "ALL", 2L)))
  }

  test("lab ranking merges case variants and aggregates countries") {
    import spark.implicits._
    val g = Seq(("Lab A", "Switzerland"), ("LAB A", "Germany"), ("Lab B", "France"))
      .toDF("submitting_lab", "country")
    val out = Reports.labRanking(g).collect()
    assert(out(0).getString(0) == "lab a" && out(0).getLong(1) == 2)
    assert(out(0).getString(2) == "Germany; Switzerland")
  }

  test("author ranking explodes and trims author lists") {
    import spark.implicits._
    val a = Seq(Tuple1("Doe J, Smith A"), Tuple1("Smith A,  Lee K")).toDF("authors")
    val out = Reports.authorRanking(a).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == (("Smith A", 2L)))
    assert(out.toMap == Map("Smith A" -> 2L, "Doe J" -> 1L, "Lee K" -> 1L))
  }

  test("bag report picks released first, then most complete") {
    import spark.implicits._
    val seqId = Seq(("s1", "EPI_1")).toDF("sample_name", "gisaid_id")
    val out = Reports.bagSequenceReport(consensus, seqId).collect()
      .map(r => r.getAs[Long]("ethid") -> r.getAs[String]("sample_name")).toMap
    // ethid 1: s1 released (despite higher consensus_n than s2)
    assert(out(1L) == "s1")
    assert(out(2L) == "s3" && out(3L) == "s5")
  }

  test("variant contingency: best-per-ethid pick, 80% flag, 8-way cells") {
    import spark.implicits._
    // ethid 1 has two records; s1 (consensus_n 5) wins and carries 2/2
    // variant mutations → variant. ethid 2's best (s3) has 1/2 → not.
    val cs = Seq(("s1", 1L, 5), ("s2", 1L, 9), ("s3", 2L, 3)).toDF("sample_name", "ethid", "consensus_n")
    val muts = Seq(("s1", "S:N501Y"), ("s1", "S:A570D"), ("s2", "S:N501Y"), ("s3", "S:N501Y"))
      .toDF("sample_name", "aa_mutation")
    val defs = Seq("S:N501Y", "S:A570D").toDF("aa_mutation")
    val tests = Seq((101L, 1L, "2021-01-10"), (102L, 2L, "2021-02-01"), (103L, 2L, "2021-06-01"))
      .toDF("sample_number", "ethid", "order_date")
    val bag = Seq(
      (101L, 35, "HOSPITALIZED", true),
      (102L, 35, null.asInstanceOf[String], false),
      (103L, 35, "HOSPITALIZED", true) // outside the date range → excluded
    ).toDF("sample_number", "altersjahr", "hospitalisation_type", "pttod")
    val out = Reports.variantContingency(cs, muts, defs, tests, bag,
      "2021-01-01", "2021-02-15").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("age_group") == "30-39")
    assert(r.getAs[Long]("total") == 2)
    assert(r.getAs[Long]("variant_hospitalized") == 1)      // ethid 1: variant + hosp
    assert(r.getAs[Long]("not_variant_not_hospitalized") == 1) // ethid 2
    assert(r.getAs[Long]("variant_dead") == 1)
    assert(r.getAs[Long]("not_variant_not_dead") == 1)
  }

  test("omicron candidates: spike-count OR lineage, enriched and deduped") {
    import spark.implicits._
    val muts = Seq(
      ("s1", "S:G339D"), ("s1", "S:S371L"),   // 2 hits → candidate
      ("s2", "S:G339D"),                       // 1 hit → not by spike
      ("s3", "S:K417N"), ("s3", "S:E484A")).toDF("sample_name", "aa_mutation")
    val nd = Seq(("s2", "BA.1"), ("s3", "B.1.1.7"), ("s4", "B.1.1.529.1"))
      .toDF("sample_name", "pangolin_lineage")
    val cs = Seq(("s1", 1L, "gfb"), ("s2", 2L, "gfb"), ("s3", 3L, "gfb"), ("s4", 4L, "h2030"))
      .toDF("sample_name", "ethid", "sequencing_center")
    val tests = Seq((1L, 201L), (2L, 202L)).toDF("ethid", "sample_number")
    val seqId = Seq(("s1", "EPI_9")).toDF("sample_name", "gisaid_id")
    val spike = Seq("S:G339D", "S:S371L", "S:K417N", "S:E484A")
    val out = Reports.omicronCandidates(cs, muts, nd, tests, seqId, spike)
      .select("sample_name").as[String].collect().toSeq
    // s1 (2 spike hits), s2 (BA lineage), s3 (2 spike hits), s4 (B.1.1.529)
    assert(out.sorted == Seq("s1", "s2", "s3", "s4"))
    assert(out.size == out.distinct.size, "union must be distinct")
    val s1 = Reports.omicronCandidates(cs, muts, nd, tests, seqId, spike)
      .filter($"sample_name" === "s1").head()
    assert(s1.getAs[String]("gisaid_id") == "EPI_9")
    assert(s1.getAs[Long]("sample_number") == 201L)
    // batch filter narrows the consensus side
    assert(Reports.omicronCandidates(cs.withColumn("sequencing_batch", lit("b7")),
      muts, nd, tests, seqId, spike, batch = Some("nope")).count() == 0)
  }

  test("close-country: absolute majority share with rollup total row") {
    import spark.implicits._
    val seqs = Seq(
      ("st1", "USA", "2020-03-05"), ("st2", "USA", "2020-03-20"),
      ("st3", "USA", "2020-04-01"),  // wrong month
      ("st4", "Denmark", "2020-03-10")) // wrong country
      .toDF("strain", "country", "date").withColumn("date", to_date($"date"))
    // st1: 6 votes China → majority; st2: 3+3 split → no majority
    val cc = (Seq.fill(6)(("st1", "China")) ++
      Seq.fill(3)(("st2", "Italy")) ++ Seq.fill(3)(("st2", "Spain")) ++
      Seq.fill(9)(("st3", "China")) ++ Seq.fill(6)(("st4", "Germany")))
      .toDF("strain", "close_country")
    val out = Reports.closeCountryMajority(seqs, cc, "USA", 2020, 3).collect()
      .map(r => Option(r.getString(0)).getOrElse("TOTAL") ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map("China" -> (("100.00%", 1L)), "TOTAL" -> (("100.00%", 1L))))
  }

  test("close-country: monthly proportions sum to 1 per month") {
    import spark.implicits._
    val seqs = Seq(
      ("st1", "Denmark", "2020-03-05"), ("st2", "Denmark", "2020-03-20"),
      ("st3", "Denmark", "2020-04-02"))
      .toDF("strain", "country", "date").withColumn("date", to_date($"date"))
    val cc = (Seq.fill(6)(("st1", "Germany")) ++ Seq.fill(7)(("st2", "Sweden")) ++
      Seq.fill(6)(("st3", "Germany"))).toDF("strain", "close_country")
    val out = Reports.closeCountryMonthlyProportion(seqs, cc, "Denmark").collect()
      .map(r => (r.getAs[String]("est_country"), r.getAs[Int]("year"),
        r.getAs[Int]("month"), r.getAs[Long]("count"), r.getAs[Double]("proportion")))
    assert(out.toSet == Set(
      ("Germany", 2020, 3, 1L, 0.5), ("Sweden", 2020, 3, 1L, 0.5),
      ("Germany", 2020, 4, 1L, 1.0)))
  }

  test("mutation prevalence: EXISTS-restricted denominator, 20% integer cut") {
    import spark.implicits._
    // s1..s4 are lineage X; s4 has NO mutation rows so it is outside
    // the denominator (the reference's EXISTS); s5 is another lineage
    val gisaid = Seq(("s1", "X"), ("s2", "X"), ("s3", "X"), ("s4", "X"), ("s5", "Y"))
      .toDF("strain", "pango_lineage")
    val muts = Seq(
      ("s1", 912, "T"), ("s2", 912, "T"), ("s3", 912, "T"), // 3/3 = 100%
      ("s1", 100, "A"),                                     // 1/3 ≥ 20% → kept
      ("s5", 200, "G")                                      // other lineage only
    ).toDF("strain", "position", "mutation")
    val out = Reports.mutationPrevalence(gisaid, muts, "X").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // positions are 1-shifted (ref: m.position + 1); ordered n desc, position
    assert(out.toSeq == Seq((913, "T", 3L, 1.0), (101, "A", 1L, 1.0 / 3)))
    // a 40% threshold cuts the singleton exactly at the integer boundary
    val strict = Reports.mutationPrevalence(gisaid, muts, "X", prevNum = 40).collect()
    assert(strict.map(_.getInt(0)).toSeq == Seq(913))
  }

  test("host summary: per-host count and date range for one country") {
    import spark.implicits._
    import java.sql.Date
    val g = Seq(
      ("Human", "Denmark", "2021-01-05"), ("Human", "Denmark", "2021-02-01"),
      ("Mink", "Denmark", "2021-01-20"), ("Human", "Sweden", "2021-03-01"))
      .map { case (h, c, d) => (h, c, Date.valueOf(d)) }
      .toDF("host", "country_original", "date")
    val out = Reports.hostSummary(g, "Denmark").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString, r.getDate(3).toString))
    assert(out.toSeq == Seq(
      ("Human", 2L, "2021-01-05", "2021-02-01"),
      ("Mink", 1L, "2021-01-20", "2021-01-20")))
  }

  test("completeness funnel counts stages in one pass") {
    import spark.implicits._
    val tests = Seq(1L, 2L, 3L, 4L).toDF("ethid")
    val seqId = Seq((1L, "EPI_1"), (2L, null.asInstanceOf[String])).toDF("ethid", "gisaid_id")
    val r = Reports.completenessFunnel(tests, consensus.filter("ethid is not null"), seqId).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 1L)))
  }
}
