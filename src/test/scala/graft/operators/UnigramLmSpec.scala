package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM guarantees: the frame DP against an independently
  * written sequential reference (same integer objective), hand-traced
  * segmentations, and the hard-EM round's prune/feasibility contract. */
class UnigramLmSpec extends SparkSpec {

  /** Reference DP — a plain sequential fold, written independently of
    * the frame implementation (the python-prototype twin). */
  private def refSeg(word: String, bl: Map[String, Long]): Option[(Long, Long, String)] = {
    val n = word.length
    val dp = Array.fill[Option[(Long, Long, String)]](n + 1)(None)
    dp(0) = Some((0L, 0L, ""))
    for (j <- 1 to n) {
      var best: Option[(Long, Long, String)] = None
      for (i <- math.max(0, j - UnigramLm.MaxPiece) until j; st <- dp(i)) {
        val p = word.substring(i, j)
        bl.get(p).foreach { b =>
          val cand = (st._1 + 1, st._2 + b, if (st._3.isEmpty) p else st._3 + "|" + p)
          val better = best.forall { bst =>
            cand._1 < bst._1 || (cand._1 == bst._1 && (cand._2 > bst._2 ||
              (cand._2 == bst._2 && cand._3 < bst._3)))
          }
          if (better) best = Some(cand)
        }
      }
      dp(j) = best
    }
    dp(n)
  }

  private def vocabDf(entries: (String, Long)*) = {
    import spark.implicits._
    entries.toSeq.toDF("piece", "freq")
      .withColumn("bl", length(bin(col("freq"))).cast("long"))
  }

  private def unitsDf(words: String*) = {
    import spark.implicits._
    words.toSeq.map(w => (w, 1L, w.length)).toDF("unit", "ucount", "ulen")
  }

  test("degenerate docs (no [a-z ] content, or one token) yield zero units, not a slice error") {
    import spark.implicits._
    val docs = Seq("1234 !!!", "", "solo", "two words").toDF("text")
    val u = UnigramLm.units(docs, "text").collect()
    // only the two-token doc contributes a pair; the empty/one-token
    // docs must not fail the scan (slice with negative length throws)
    assert(u.map(_.getString(0)).toSeq == Seq("twowords"))
  }

  test("hand-traced: fewest pieces wins; bitlength score then seg string break ties") {
    // "abcd": {abc,d} (2 pieces) beats {ab,cd} (2 pieces) only via
    // score: bl(ab)=bl(freq 8)=4, bl(cd)=4 → 8; bl(abc)=bl(2)=2,
    // bl(d)=2 → 4. So ab|cd wins on score despite abc|d existing.
    val v = vocabDf("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 8L, "cd" -> 8L, "abc" -> 2L)
    val got = UnigramLm.viterbiSegment(unitsDf("abcd"), v)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).head
    assert(got == (("abcd", 2L, "ab|cd")), s"got $got")
  }

  test("hand-traced: lexicographic seg tie-break is the last resort and is deterministic") {
    // "aba" with {ab(4), ba(4), a(4), b(4)}: 2-piece options ab|a and
    // a|ba with equal scores → seg-string compare decides. '|' (0x7C)
    // sorts AFTER every ASCII letter, identically in Spark, DuckDB and
    // the JVM — so "ab|a" < "a|ba" (position 1: 'b' < '|') and the
    // longer-first split wins the tie deterministically.
    val v = vocabDf("a" -> 4L, "b" -> 4L, "ab" -> 4L, "ba" -> 4L)
    val got = UnigramLm.viterbiSegment(unitsDf("aba"), v)
      .collect().map(r => (r.getLong(1), r.getString(3))).head
    assert(got == ((2L, "ab|a")), s"got $got")
  }

  test("property: frame DP == sequential reference on the real sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val u = UnigramLm.units(docs, "text")
    val v = UnigramLm.seedVocab(u)
    val bl = v.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = UnigramLm.viterbiSegment(u, v)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val unitsLocal = u.select("unit").collect().map(_.getString(0))
    assert(unitsLocal.nonEmpty)
    unitsLocal.foreach { w =>
      val ref = refSeg(w, bl)
      assert(ref.isDefined, s"reference found $w infeasible")
      assert(got.get(w).contains(ref.get), s"$w: frame=${got.get(w)} ref=$ref")
    }
  }

  test("round-trip: concatenating a segmentation's pieces reproduces the unit exactly") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val u = UnigramLm.units(docs, "text")
    val seg = UnigramLm.viterbiSegment(u, UnigramLm.seedVocab(u))
    val broken = seg.filter(
      regexp_replace(col("seg"), "\\|", "") =!= col("unit")).count()
    assert(broken == 0, "every segmentation must be a partition of its unit")
  }

  test("hard-EM round: prune shrinks the vocab, chars survive, all units stay segmentable") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val u = UnigramLm.units(docs, "text")
    val v = UnigramLm.seedVocab(u)
    val seg1 = UnigramLm.viterbiSegment(u, v)
    val usage = UnigramLm.pieceUsage(seg1, u)
    val v2 = UnigramLm.pruneVocab(v, usage)
    assert(v2.count() < v.count(), "prune must drop unused/rare pieces")
    val singles = v.filter(length(col("piece")) === 1).count()
    assert(v2.filter(length(col("piece")) === 1).count() == singles,
      "every single char survives pruning")
    val seg2 = UnigramLm.viterbiSegment(u, v2)
    assert(seg2.count() == u.count(), "every unit segmentable after pruning")
    // every piece used in round 2 is in the pruned vocab
    val v2pieces = v2.select("piece").collect().map(_.getString(0)).toSet
    val used2 = seg2.select(explode(split(col("seg"), "\\|")).as("p"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(used2.subsetOf(v2pieces))
  }
}
