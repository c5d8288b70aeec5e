package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import QualityClassifier._
  import spark.implicits._

  // reference docs speak "alpha"; background is mostly "junk" with one
  // reference-like document hiding in it
  private def fixture = Seq(
    (1L, "alpha beta gamma alpha delta", true),
    (2L, "alpha gamma epsilon alpha beta", true),
    (3L, "alpha delta beta gamma alpha", true),
    (10L, "junk spam noise junk filler", false),
    (11L, "spam filler noise spam junk", false),
    (12L, "alpha beta gamma delta alpha", false), // reference-like
    (13L, "", false)
  ).toDF("doc_id", "text", "is_ref")

  private def model = train(fixture, "text", $"is_ref")

  test("classifyExact keeps the reference-like background doc and drops the junk") {
    val out = classifyExact(fixture.filter(!$"is_ref"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(12L) == 1L, "reference-like doc must classify target-like")
    assert(out(10L) == 0L && out(11L) == 0L, "junk must not")
    assert(out(13L) == 0L, "empty docs are never target-like")
  }

  test("scoreLogOdds ranks consistently with the exact decision on the fixture") {
    val s = scoreLogOdds(fixture.filter(!$"is_ref" && length($"text") > 0),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(12L) > 0, "reference-like doc scores positive log-odds")
    assert(s(12L) > s(10L) && s(12L) > s(11L))
    assert(s(10L) < 0 && s(11L) < 0)
  }

  test("the trained model is bucket-bounded (broadcastable at any corpus scale)") {
    assert(model.count() <= Buckets)
    // mass law: bucket counts sum to the token totals per class
    val r = model.agg(sum($"cnt_t"), sum($"cnt_b")).head()
    assert(r.getLong(0) == 15L) // 3 ref docs x 5 tokens
    assert(r.getLong(1) == 15L) // 2 junk x 5 + ref-like 5 + empty 0
  }

  test("scoring joins the model broadcast (map-side apply)") {
    val df = classifyExact(fixture.filter(!$"is_ref"), "doc_id", "text", model)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"model must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no vocabulary shuffle:\n$p")
  }
}
