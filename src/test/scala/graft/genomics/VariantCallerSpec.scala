package graft.genomics

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class VariantCallerSpec extends SparkSpec {

  test("80% rule: states and call thresholds match the reference semantics") {
    import spark.implicits._
    // defs: 5 defining mutations at positions 1..5 (original ref base → mutated)
    val defs = Seq("A1T", "C2G", "G3A", "T4C", "A5G").toDF("nucleotide_mutation")
    // pos:        12345
    val seqs = Seq(
      ("all_mut",  "TGACG" + "AAAAA"), // 5/5 confirmed → variant
      ("four_mut", "TGACA" + "AAAAA"), // 4/5 = 0.8 → variant (>= threshold)
      ("three",    "TGATA" + "AAAAA"), // 3/5 → not variant, callable
      ("unknown",  "NNNNN" + "AAAAA"), // all '?' → not callable
      ("wildtype", "ACGTA" + "AAAAA")  // all '-' → not variant, callable
    ).toDF("sample_name", "seq")
    val out = VariantCaller.call(seqs, defs, "sample_name", "seq", "nucleotide_mutation")
      .collect().map(r => r.getAs[String]("sample_name") ->
        ((r.getAs[Long]("confirmed"), r.getAs[Boolean]("is_variant"), r.getAs[Boolean]("callable"))))
      .toMap
    assert(out("all_mut") == ((5L, true, true)))
    assert(out("four_mut") == ((4L, true, true)))
    assert(out("three") == ((3L, false, true)))
    assert(out("unknown") == ((0L, false, false)))
    assert(out("wildtype") == ((0L, false, true)))
  }

  test("state classification: -, +, ?, !") {
    import spark.implicits._
    val defs = Seq("A1T").toDF("m")
    val seqs = Seq(("a", "A"), ("b", "T"), ("c", "N"), ("d", "-")).toDF("id", "seq")
    val st = VariantCaller.states(seqs, defs, "id", "seq", "m")
      .select(col("id"), col("mutation_state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("a" -> "-", "b" -> "+", "c" -> "?", "d" -> "!"))
  }

  test("null and short sequences still emit one '!' state per def") {
    import spark.implicits._
    val defs = Seq("A1T", "C2G", "G3A").toDF("m")
    val seqs = Seq(("nullseq", null: String), ("shortseq", "A"))
      .toDF("id", "seq")
    val st = VariantCaller.states(seqs, defs, "id", "seq", "m").collect()
    // the null-sequence sample must NOT vanish: 3 defs → 3 rows, all '!'
    val nullRows = st.filter(_.getAs[String]("id") == "nullseq")
    assert(nullRows.length == 3)
    assert(nullRows.forall(_.getAs[String]("mutation_state") == "!"))
    // short sequence: in-range site classifies normally, out-of-range → '!'
    val shortRows = st.filter(_.getAs[String]("id") == "shortseq")
      .map(r => r.getAs[Int]("position") -> r.getAs[String]("mutation_state")).toMap
    assert(shortRows == Map(1 -> "-", 2 -> "!", 3 -> "!"))
    val call = VariantCaller.call(seqs, defs, "id", "seq", "m").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("weird")).toMap
    assert(call("nullseq") == 3L)
  }
}
