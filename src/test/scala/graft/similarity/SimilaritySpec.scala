package graft.similarity

import graft.SparkSpec
import graft.similarity.OriginCountry._
import graft.similarity.Priorities

class SimilaritySpec extends SparkSpec {

  //                       123456789
  private val ref = "ACGTACGTAC"

  test("D3 encode: mutations + unknown positions, 1-indexed") {
    val m = encode("s", "CH", ref, "TCGTACGTNC")
    assert(m.mutPositions.toSeq == Seq(1))
    assert(m.mutBases.toSeq == Seq('T'))
    assert(m.unknownPositions.toSeq == Seq(9))
  }

  test("D3 distance: exclusive counts unless unknown in the other") {
    val a = encode("a", "CH", ref, "TCGTACGTAC") // mut at 1
    val b = encode("b", "DE", ref, "ACGTACGTAG") // mut at 10
    assert(distance(a, b) == 1) // early-break quirk: b's trailing mutation uncounted after a exhausts... merge order: a=(1), b=(10): pa<pb → +1 (10 known in b? checking b.unknown for pos 1) then i=1 → loop ends; b's mut at 10 not counted
    val c = encode("c", "FR", ref, "GCGTACGTAC") // different base at same pos 1
    assert(distance(a, c) == 1)
    val d0 = encode("d", "IT", ref, "NCGTACGTAC") // pos 1 unknown
    // a has mut at 1; 1 is unknown in d → not counted
    assert(distance(a, d0) == 0)
  }

  test("D3 closest country: first minimum wins deterministically") {
    val q = encode("q", null, ref, "TCGTACGTAC")
    // reference quirk reproduced: a wildtype ref (empty mutation list)
    // short-circuits the merge loop → distance 0 to ANY sample
    val wildtype = encode("r1", "DE", ref, "ACGTACGTAC")
    assert(distance(q, wildtype) == 0)
    val refs = Seq(
      wildtype,                               // d=0, first
      encode("r2", "CH", ref, "TCGTACGTAC"),  // d=0, later → loses tie
      encode("r3", "FR", ref, "GCGTACGTAC"))  // d=1
    assert(closestCountry(q, refs) == (("DE", 0)))
  }

  test("D3 end-to-end estimate + majority vote") {
    import spark.implicits._
    val queries = Seq(("q1", "TCGTACGTAC"), ("q2", "ACGTACGTAG")).toDF("id", "seq")
    val refSets = Seq(
      Seq(encode("r1", "CH", ref, "TCGTACGTAC"), encode("r2", "DE", ref, "ACGTACGTAG")),
      Seq(encode("r3", "CH", ref, "TCGTACGTAC"), encode("r4", "DE", ref, "ACGTACGTAG")))
    val rf = ref // local copy: the closure must not capture the suite
    val est = estimate(spark, queries, refSets)(r =>
      encode(r.getString(0), null, rf, r.getString(1)))
    assert(est.count() == 4) // 2 queries × 2 sets
    val votes = majorityVote(est).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(votes == Map("q1" -> "CH", "q2" -> "DE"))
  }

  test("D3 stratified sample: proportional caps per country") {
    import spark.implicits._
    val df = (1 to 90).map(i => (s"s$i", if (i <= 60) "CH" else "DE")).toDF("id", "country")
    val cases = Seq(("CH", 200L), ("DE", 100L)).toDF("country", "n_cases")
    val out = stratifiedSample(df, "country", cases, totalWanted = 30, seed = None)
    val byCountry = out.groupBy("country").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCountry("CH") == 20 && byCountry("DE") == 10)
  }

  test("D4 pairsnp distance: full merge incl. trailing exclusives") {
    val a = Priorities.encode("a", ref, "tcgtacgtac") // snp at 0
    val b = Priorities.encode("b", ref, "acgtacgtag") // snp at 9
    assert(Priorities.distance(a, b) == 2) // both exclusive — no early break (unlike D3)
    val n = Priorities.encode("n", ref, "ncgtacgtac") // masked at 0
    assert(n.maskCount == 1 && Priorities.distance(a, n) == 1) // a-only snp counts
  }

  test("D4 score: closest focal with mask penalty, crowding rank penalty") {
    import spark.implicits._
    val contexts = Seq(
      ("c1", "tcgtacgtac"),  // d=0 to f1
      ("c2", "tcgtacgtan"),  // d=0 to f1, 1 masked → ranked after c1
      ("c3", "acgtacgtag")   // d=0 to f2
    ).toDF("id", "seq")
    val focals = Seq(
      Priorities.encode("f1", ref, "tcgtacgtac"),
      Priorities.encode("f2", ref, "acgtacgtag"))
    val rf = ref
    val out = Priorities.score(spark, contexts, focals, rf.length)(r =>
      Priorities.encode(r.getString(0), rf, r.getString(1)))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out("c1") == (("f1", 0, 0.0)))
    assert(out("c2")._1 == "f1" && out("c2")._3 == -0.1) // rank 1 under f1
    assert(out("c3") == (("f2", 0, 0.0)))
  }
}
