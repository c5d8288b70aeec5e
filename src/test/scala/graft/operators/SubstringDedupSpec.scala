package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("repeated span marks only the later occurrence; coverage merges overlaps") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // original: nothing flagged
      (2L, "x y a b c d e f z"),        // spans of "a b c d e"/"b c d e f" repeat doc 1
      (3L, "p q r s t")                 // unique 5 tokens, no dup
    ).toDF("doc_id", "text")
    val r = SubstringDedup.spanCoverage(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // doc 2: grams "a b c d e" (pos 3) and "b c d e f" (pos 4) are both
    // seen in doc 1 first -> covered positions 3..8 = 6 tokens
    assert(r.toSeq == Seq((1L, 8L, 0L), (2L, 9L, 6L), (3L, 5L, 0L)))
  }

  test("within-document repetition counts: the second copy of a span is flagged") {
    val docs = Seq((1L, "a b c d e x x a b c d e")).toDF("doc_id", "text")
    val r = SubstringDedup.spanCoverage(docs, "doc_id", "text", 5)
      .collect().map(x => (x.getLong(1), x.getLong(2))).head
    // tokens 8..12 ("a b c d e" again) flagged -> 5 covered positions
    assert(r == ((12L, 5L)))
  }

  test("documents shorter than k contribute nothing and report zero") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val r = SubstringDedup.spanCoverage(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 2L, 0L), (2L, 2L, 0L)))
  }

  test("cutSpans removes exactly the covered positions; exact copies vanish") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f z"),        // positions 3..8 covered (two overlapping spans)
      (3L, "a b c d e f g h"),          // exact copy of doc 1 -> fully cut
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val r = SubstringDedup.cutSpans(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 8L, 8L, "a b c d e f g h"),
      (2L, 9L, 3L, "x y z"),
      (3L, 8L, 0L, ""),
      (4L, 5L, 5L, "p q r s t")))
    // cut and coverage agree: n_tokens - n_kept == dup_tokens
    val cov = SubstringDedup.spanCoverage(docs, "doc_id", "text", 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r.forall { case (id, n, kept, _) => n - kept == cov(id) })
  }

  test("result is partitioning-independent") {
    val docs = graft.Tables.documents(spark, sf0001)
    def run(parts: Int) = SubstringDedup.spanCoverage(
        docs.repartition(parts), "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(13))
  }

  test("spanContamination: benchmark coverage per doc, benchmark grams broadcast") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y alpha beta gamma delta epsilon q r s"), // quotes 5 bench tokens
      (2L, "p q r s t u v")                             // clean
    ).toDF("doc_id", "text")
    val r = Decontamination.spanContamination(corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // doc 1's only bench-matching gram is "alpha beta gamma delta
    // epsilon" at pos 3 -> coverage = tokens 3..7 = 5
    assert(r.toSeq == Seq((1L, 10L, 5L), (2L, 7L, 0L)))
    // plan: the benchmark gram set must carry the broadcast hint
    val qe = Decontamination.spanContamination(corpus, bench, "doc_id", "text", 5)
      .queryExecution
    assert(qe.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.nonEmpty, "benchmark grams must broadcast")
  }

  test("cutContaminated removes exactly the benchmark spans and agrees with dc2's coverage") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y alpha beta gamma delta epsilon q r s"),
      (2L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val cut = Decontamination.cutContaminated(corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(cut.toSeq == Seq(
      (1L, 10L, 5L, "x y q r s"), // the quoted bench span is excised
      (2L, 7L, 7L, "p q r s t u v")))
    // invariant tying the cut to the metric: tokens removed == dc2's
    // contam_tokens for every doc
    val cov = Decontamination.spanContamination(corpus, bench, "doc_id", "text", 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    cut.foreach { case (id, n, kept, _) => assert(n - kept == cov(id)) }
  }

  test("the rank window runs over the duplicated-gram slice, not the full gram stream") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = SubstringDedup.spanCoverage(docs, "doc_id", "text", 5)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1)
    // beneath the window there must be a join (the dup-gram semi-join)
    assert(windows.head.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty, "rank window must sit above the duplicated-gram semi-join")
  }
}
