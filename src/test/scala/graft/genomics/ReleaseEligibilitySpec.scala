package graft.genomics

import graft.SparkSpec

class ReleaseEligibilitySpec extends SparkSpec {

  test("D12 ordered ladder: first matching reason wins; dup index within (ethid, pass)") {
    import spark.implicits._
    val seqs = Seq(
      // sample, ethid, batch, qc, consensus_n, release_decision
      ("ok",          Some(1), "b1", "no fail reason", 10, false),
      ("dup_of_1",    Some(1), "b1", "no fail reason", 20, false), // higher consensus_n → duplicate_idx 2
      ("unfinalized", Some(2), "b2", "no fail reason", 10, false),
      ("held",        Some(3), "b1", "no fail reason", 10, true),
      ("released",    Some(4), "b1", "no fail reason", 10, false),
      ("no_meta",     Some(5), "b1", "no fail reason", 10, false),
      ("null_ethid",  None,    "b1", "no fail reason", 10, false),
      ("discrepant",  Some(6), "b1", "no fail reason", 10, false),
      ("failed_qc",   Some(7), "b1", "degraded",       10, false)
    ).map { case (s, e, b, q, n, r) => (s, e.map(_.toLong), b, q, n, r) }
      .toDF("sample_name", "ethid", "sequencing_batch", "qc_result", "consensus_n", "release_decision")
    val finalized = Seq("b1").toDF("sequencing_batch")
    val incomplete = Seq("b1").toDF("sequencing_batch")
    val released = Seq(4L).toDF("ethid")
    // includes a null ethid: mirrors R's `NA %in% has_metadata` being
    // TRUE when the metadata table holds NA — only then is the
    // "null ethid" ladder arm reachable
    val hasMeta = (Seq(1L, 2L, 3L, 4L, 6L, 7L).map(Option(_)) :+ None).toDF("ethid")
    val discrepant = Seq("discrepant").toDF("sample_name")

    val out = ReleaseEligibility.annotate(seqs, finalized, incomplete, released, hasMeta, discrepant)
      .collect().map(r => r.getAs[String]("sample_name") -> r.getAs[String]("qc_result_annotated")).toMap

    assert(out("ok") == "no fail reason")
    assert(out("dup_of_1") == "less complete duplicate")
    assert(out("unfinalized").startsWith("sequencing batch not finalized"))
    assert(out("held") == "column release_decision in consensus_sequence is true")
    assert(out("released") == "ethid already released or submitted")
    assert(out("no_meta") == "no metadata in test_metadata")
    assert(out("null_ethid") == "null ethid")
    assert(out("discrepant").startsWith("sequence discrepency"))
    assert(out("failed_qc") == "degraded") // fall-through keeps original

    val release = ReleaseEligibility.toRelease(
      ReleaseEligibility.annotate(seqs, finalized, incomplete, released, hasMeta, discrepant))
    assert(release.collect().map(_.getAs[String]("sample_name")).toSeq == Seq("ok"))
  }

  test("D12 warning: incomplete batch flagged independently") {
    import spark.implicits._
    val seqs = Seq(("s", Some(1L), "b1", "no fail reason", 1, false))
      .toDF("sample_name", "ethid", "sequencing_batch", "qc_result", "consensus_n", "release_decision")
    val out = ReleaseEligibility.annotate(seqs,
      Seq("b1").toDF("sequencing_batch"), Seq("b1").toDF("sequencing_batch"),
      spark.emptyDataFrame.withColumn("ethid", org.apache.spark.sql.functions.lit(0L)).limit(0),
      Seq(1L).toDF("ethid"), Seq.empty[String].toDF("sample_name"))
    val r = out.collect()(0)
    assert(r.getAs[String]("warning_reason") != null)
    assert(r.getAs[String]("qc_result_annotated") == "no fail reason")
  }
}
