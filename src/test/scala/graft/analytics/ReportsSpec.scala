package graft.analytics

import graft.SparkSpec

class ReportsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

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

  test("completeness funnel counts stages in one pass") {
    import spark.implicits._
    val tests = Seq(1L, 2L, 3L, 4L).toDF("ethid")
    val seqId = Seq((1L, "EPI_1"), (2L, null.asInstanceOf[String])).toDF("ethid", "gisaid_id")
    val r = Reports.completenessFunnel(tests, consensus.filter("ethid is not null"), seqId).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 1L)))
  }
}
