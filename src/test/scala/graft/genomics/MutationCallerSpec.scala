package graft.genomics

import graft.SparkSpec
import graft.genomics.MutationCaller._

class MutationCallerSpec extends SparkSpec {
  private val ref = "ACGTACGTAC"

  test("identical sequence yields no mutations") {
    assert(callMutations(ref, Set.empty)("ACGTACGTAC").isEmpty)
  }

  test("substitutions and deletions are called 1-indexed") {
    //        ACGTACGTAC
    val s = "TCGTAC-TAC"
    assert(callMutations(ref, Set.empty)(s) ==
      Seq(Mutation(1, "T"), Mutation(7, "-")))
  }

  test("leading/trailing deletion runs are re-masked to N (not called)") {
    val s = "--GTACGT--"
    assert(callMutations(ref, Set.empty)(s).isEmpty)
  }

  test("internal gap after leading run is still a deletion") {
    val s = "--GT-CGTAC"
    assert(callMutations(ref, Set.empty)(s) == Seq(Mutation(5, "-")))
  }

  test("masked sites are skipped") {
    val s = "TCGTACGTAC"
    assert(callMutations(ref, Set(1))(s).isEmpty)
  }

  test("ambiguous bases (N, IUPAC) are skipped") {
    val s = "NCGTACGTAY"
    assert(callMutations(ref, Set.empty)(s).isEmpty)
  }

  test("lowercase input is uppercased") {
    val s = "tCGTACGTAC".toLowerCase
    assert(callMutations(ref, Set.empty)(s) == Seq(Mutation(1, "T")))
  }

  test("length mismatch throws (sequence must be aligned)") {
    assertThrows[IllegalArgumentException](callMutations(ref, Set.empty)("ACGT"))
  }

  test("callTable explodes to long format on Spark") {
    import spark.implicits._
    val df = Seq(("s1", "TCGTACGTAC"), ("s2", "ACGTACGTAC")).toDF("sample_name", "seq")
    val out = callTable(spark, df, "sample_name", "seq", ref, Set.empty)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(("s1", 1, "T")))
  }
}
