package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class SpectrumViewsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  // FIXTURES.md-shaped miniature domain tables
  private def fixtures: Map[String, DataFrame] = {
    import spark.implicits._
    val consensus = Seq(
      // sample_name, ethid, number_n, fail_reason, pango_lineage
      ("160001_p1_A1", 160001L, 100, null, "B.1.1.7"),
      ("160001_p2_B2", 160001L, 50, null, "B.1.1.7"),   // better dup (lower number_n)
      ("160002_p1_C3", 160002L, 10, null, "B.1.617.2"),
      ("160003_p1_D4", 160003L, 10, "degraded", "None") // failed → excluded
    ).toDF("sample_name", "ethid", "number_n", "fail_reason", "pango_lineage")
    val seqId = Seq(
      (160002L, "160002_p1_C3", "Switzerland/ZH-ETHZ-160002/2021") // released (per-sample link)
    ).toDF("ethid", "sample_name", "gisaid_id")
    val viollier = Seq(
      (160001L, Date.valueOf("2021-03-01"), "ZH"),
      (160002L, Date.valueOf("2021-03-02"), "BE"),
      (160003L, Date.valueOf("2021-03-03"), "VS")
    ).toDF("ethid", "order_date", "canton")
    val gisaid = Seq(
      ("Germany/BY-1/2021", "Germany", "Bavaria", Date.valueOf("2021-03-01"), "B.1.1.7"),
      ("Switzerland/ZH-ETHZ-160002/2021", "Switzerland", "Zurich", Date.valueOf("2021-03-02"), "B.1.617.2") // our re-upload → excluded
    ).toDF("strain", "country", "division", "date", "pango_lineage")
    val nucMut = Seq(
      ("UNRELEASED_ETHZ_160001", 913, "T"),
      ("Germany/BY-1/2021", 3037, "T")
    ).toDF("strain", "position", "mutation")
    val aaMut = Seq(
      ("UNRELEASED_ETHZ_160001", "S:N501Y")
    ).toDF("strain", "aa_mutation")
    val cases = Seq(
      (Date.valueOf("2021-03-01"), "Switzerland", 100L),
      (Date.valueOf("2021-03-01"), "Germany", 500L)
    ).toDF("date", "country", "new_cases")
    val countries = Seq(("Europe", "Switzerland"), ("Europe", "Germany"))
      .toDF("region", "country")
    val bag = Seq(
      (Date.valueOf("2021-03-01"), "ZH", 25),
      (Date.valueOf("2021-03-01"), "ZH", 85),
      (Date.valueOf("2021-03-02"), "BE", 42)
    ).toDF("fall_dt", "ktn", "altersjahr")
    Map("consensus" -> consensus, "seqId" -> seqId, "viollier" -> viollier,
      "gisaid" -> gisaid, "nucMut" -> nucMut, "aaMut" -> aaMut,
      "cases" -> cases, "countries" -> countries, "bag" -> bag)
  }

  private lazy val views = {
    val f = fixtures
    SpectrumViews.buildAll(f("consensus"), f("seqId"), f("viollier"), f("gisaid"),
      f("nucMut"), f("aaMut"), f("cases"), f("countries"), f("bag"),
      "2021-03-01", "2021-03-03")
  }

  test("meta: best-per-ethid dedup, unreleased naming, ETHZ re-upload exclusion") {
    val meta = views("spectrum_sequence_public_meta").collect()
    val strains = meta.map(_.getAs[String]("strain")).toSet
    // 160001: dup resolved to one row, unreleased naming
    assert(strains.count(_ == "UNRELEASED_ETHZ_160001") == 1)
    // 160002: released under its gisaid_id via own branch
    assert(strains.contains("Switzerland/ZH-ETHZ-160002/2021"))
    // own branch contributed it; the gisaid-branch copy was excluded
    assert(meta.count(r => r.getAs[String]("strain") == "Switzerland/ZH-ETHZ-160002/2021") == 1)
    // failed sequence absent
    assert(!strains.exists(_.contains("160003")))
    // foreign strain present
    assert(strains.contains("Germany/BY-1/2021"))
    // 160001 (deduped) + 160002 (released) + Germany = 3
    assert(meta.length == 3)
  }

  test("meta: a released ethid never also emits an UNRELEASED_ETHZ_ row") {
    import spark.implicits._
    // 160010 has a released sequence AND a better (lower number_n)
    // unreleased one — the reference's NOT EXISTS (:60-67) drops the
    // whole unreleased branch for that ethid (was double-counted pre-r2)
    val consensus = Seq(
      ("160010_p1_A1", 160010L, 100, null, "B.1.1.7"),  // released below
      ("160010_p2_B2", 160010L, 10, null, "B.1.1.7"),   // better but unreleased
      // 160011: identifier released via ETHID link only (sample_name
      // matches no consensus row)
      ("160011_p1_C3", 160011L, 20, null, "BA.1")
    ).toDF("sample_name", "ethid", "number_n", "fail_reason", "pango_lineage")
    val seqId = Seq(
      (160010L, "160010_p1_A1", "Switzerland/ZH-ETHZ-160010/2021"),
      (160011L, "160011_pX_Z9", "Switzerland/ZH-ETHZ-160011/2021")
    ).toDF("ethid", "sample_name", "gisaid_id")
    val viollier = Seq((160010L, Date.valueOf("2021-03-01"), "ZH"),
      (160011L, Date.valueOf("2021-03-02"), "BE"))
      .toDF("ethid", "order_date", "canton")
    val gisaid = Seq.empty[(String, String, String, Date, String)]
      .toDF("strain", "country", "division", "date", "pango_lineage")
    val meta = SpectrumViews.sequencePublicMeta(consensus, seqId, viollier, gisaid)
      .collect().map(_.getAs[String]("strain")).toSeq.sorted
    // one released row for 160010, nothing unreleased for either ethid
    assert(meta == Seq("Switzerland/ZH-ETHZ-160010/2021"))
  }

  test("meta: failed best-per-ethid row suppresses the ethid, not promotes 2nd best") {
    import spark.implicits._
    // ranking runs over ALL rows incl. failed (cs2 has no fail filter,
    // :68-77): if the min-number_n row failed, the ethid emits nothing
    val consensus = Seq(
      ("160020_p1_A1", 160020L, 5, "degraded", "None"),
      ("160020_p2_B2", 160020L, 50, null, "B.1.1.7")
    ).toDF("sample_name", "ethid", "number_n", "fail_reason", "pango_lineage")
    val seqId = Seq.empty[(Long, String, String)].toDF("ethid", "sample_name", "gisaid_id")
    val viollier = Seq((160020L, Date.valueOf("2021-03-01"), "ZH"))
      .toDF("ethid", "order_date", "canton")
    val gisaid = Seq.empty[(String, String, String, Date, String)]
      .toDF("strain", "country", "division", "date", "pango_lineage")
    val meta = SpectrumViews.sequencePublicMeta(consensus, seqId, viollier, gisaid).collect()
    assert(meta.isEmpty)
  }

  test("private meta: full private projection, inner viollier join, Team-W exemption") {
    import spark.implicits._
    val consensus = Seq(
      ("160030_p1_A1", 160030L, 10, null, "B.1.1.7"),          // released
      ("160031_p1_B2", 160031L, 20, null, "BA.1")              // unreleased, best
    ).toDF("sample_name", "ethid", "number_n", "fail_reason", "pango_lineage")
    val seqId = Seq((160030L, "160030_p1_A1", "Switzerland/ZH-ETHZ-160030/2021"))
      .toDF("ethid", "sample_name", "gisaid_id")
    val viollier = Seq(
      (160030L, Date.valueOf("2021-03-01"), "ZH", "Zurich", "8001", 5001L),
      (160031L, Date.valueOf("2021-03-02"), "VD", "Lausanne", "1000", 5002L)
    ).toDF("ethid", "order_date", "canton", "city", "zip_code", "sample_number")
    val cantons = Seq(("ZH", "Zurich"), ("VD", "Vaud")).toDF("canton_code", "english")
    val bag = Seq(
      (5001L, 42, "Männlich", "HOSPITALIZED", false, "Geimpft", 2,
        Date.valueOf("2021-01-05"), Date.valueOf("2021-02-05")),
      (5002L, 77, "Weiblich", null.asInstanceOf[String], true, null.asInstanceOf[String],
        0, null.asInstanceOf[Date], null.asInstanceOf[Date])
    ).toDF("sample_number", "altersjahr", "sex", "hospitalisation_type", "pttod",
      "impfstatus", "dosen_anzahl", "impfdatum_dose1", "impfdatum_dose2")
    val nextclade = Seq(("160030_p1_A1", "B.1.1.7"), ("160031_p1_B2", "None"))
      .toDF("sample_name", "pangolin_lineage")
    val gisaid = Seq(
      // kept: foreign sequence
      ("Germany/BW-1/2021", "DE", "Baden-W.", "Stuttgart", Date.valueOf("2021-03-05"),
        "B.1.617.2", "Human", Integer.valueOf(30), "Male", "Lab X", "Lab X"),
      // kept although -ETHZ-: Team-W exemption
      ("Switzerland/BS-ETHZ-990/2021", "CH", "Basel", "Basel", Date.valueOf("2021-03-06"),
        "B.1.1.7", "Human", Integer.valueOf(40), "Female", "ETHZ", "Labor Team W AG"),
      // dropped: own re-upload
      ("Switzerland/ZH-ETHZ-160030/2021", "CH", "Zurich", "Zurich", Date.valueOf("2021-03-01"),
        "B.1.1.7", "Human", Integer.valueOf(42), "Male", "ETHZ", "Viollier AG"),
      // dropped: non-human host
      ("Denmark/mink-1/2020", "DK", "Jutland", null, Date.valueOf("2020-11-01"),
        "Cluster5", "Mink", null.asInstanceOf[Integer], null, "Lab Y", "Lab Y")
    ).toDF("strain", "country", "division", "location", "date", "pango_lineage",
      "host", "age", "sex", "submitting_lab", "originating_lab")
    val countries = Seq(("DE", "Europe", "Germany"), ("CH", "Europe", "Switzerland"),
      ("DK", "Europe", "Denmark")).toDF("iso_code", "region", "name")

    val out = SpectrumViews.sequencePrivateMeta(consensus, seqId, viollier, cantons,
      bag, nextclade, gisaid, countries).collect()
      .map(r => r.getAs[String]("sequence_name") -> r).toMap
    assert(out.keySet == Set("Switzerland/ZH-ETHZ-160030/2021", "UNRELEASED_ETHZ_160031",
      "Germany/BW-1/2021", "Switzerland/BS-ETHZ-990/2021"))
    val own = out("Switzerland/ZH-ETHZ-160030/2021")
    assert(own.getAs[String]("division") == "Zurich" && own.getAs[String]("zip_code") == "8001")
    assert(own.getAs[Int]("age") == 42 && own.getAs[String]("sex") == "Male")
    assert(own.getAs[Boolean]("hospitalized") && !own.getAs[Boolean]("deceased"))
    assert(own.getAs[Int]("vaccination_doses") == 2)
    val unrel = out("UNRELEASED_ETHZ_160031")
    assert(unrel.getAs[String]("pangolin_lineage") == null) // Nextclade 'None' nulled
    assert(unrel.getAs[Boolean]("deceased"))
    val de = out("Germany/BW-1/2021")
    assert(de.getAs[String]("country") == "Germany" && de.getAs[String]("region") == "Europe")
    assert(de.getAs[String]("zip_code") == null)
  }

  test("mutation views join meta and decompose AA mutations") {
    val aa = views("spectrum_sequence_mutation_aa").collect()
    assert(aa.length == 1)
    assert(aa(0).getAs[String]("gene") == "S" && aa(0).getAs[Int]("position") == 501)
    val nuc = views("spectrum_sequence_mutation_nucleotide").collect()
    assert(nuc.length == 2)
  }

  test("intensity: spine covers all date×country cells plus rollup totals") {
    val i = views("spectrum_sequence_intensity")
    // detail rows: 3 days × 2 countries
    val detail = i.filter(col("date").isNotNull && col("country").isNotNull)
    assert(detail.count() == 6)
    // grand total row aggregates everything
    val total = i.filter(col("date").isNull && col("region").isNull && col("country").isNull)
      .collect()(0)
    assert(total.getAs[Long]("cases") == 600L)
  }

  test("lineage mutation counts by region/country/date/lineage") {
    val lm = views("spectrum_pangolin_lineage_mutation").collect()
    assert(lm.length == 2)
    val german = lm.find(_.getAs[String]("country") == "Germany").get
    assert(german.getAs[String]("pango_lineage") == "B.1.1.7" &&
      german.getAs[String]("mutation") == "T")
  }

  test("swiss cases: age bucketing + canton/date counts") {
    val sc = views("spectrum_swiss_cases").collect()
    assert(sc.length == 3) // (03-01, ZH, 20-29), (03-01, ZH, 80+), (03-02, BE, 40-49)
    val buckets = sc.map(r => (r.getAs[String]("canton"), r.getAs[String]("age_group"))).toSet
    assert(buckets == Set(("ZH", "20-29"), ("ZH", "80+"), ("BE", "40-49")))
  }

  test("usage daily visitors: per-day rollup then count/avg/exact median") {
    import spark.implicits._
    import java.sql.Date
    // three days in window (one split across two OS rows), one outside
    val os = Seq(
      ("2021-09-01", "Windows", 10L, 50L), ("2021-09-01", "macOS", 20L, 60L),
      ("2021-09-02", "Windows", 50L, 70L),
      ("2021-09-03", "Linux", 40L, 80L),
      ("2021-11-05", "Windows", 999L, 999L))
      .map { case (d, o, v, h) => (Date.valueOf(d), o, v, h) }
      .toDF("date", "os", "visitors", "hits")
    val r = SpectrumViews.usageDailyVisitors(os, "2021-09-01", "2021-10-31").head()
    assert(r.getAs[Long]("number_day") == 3L)
    assert(r.getAs[Double]("avg_visitors") == 40.0) // (30 + 50 + 40) / 3
    assert(r.getAs[Double]("median_visitors") == 40.0)
  }
}
