package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Pins the relational BPE trainer to the textbook sequential
  * algorithm: a reference implementation (pair counting over a word
  * map, greedy left-to-right merge fold) must agree with the
  * window-based run-parity form on merges AND segmentations —
  * including repeated-symbol runs, where greedy semantics bite. */
class BpeSpec extends SparkSpec {

  /** Textbook greedy single-pass merge application. */
  private def greedyApply(toks: List[String], l: String, r: String): List[String] = {
    val out = mutable.ListBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  /** Textbook sequential BPE trainer. */
  private def refTrain(words: Map[String, Long], n: Int)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var seg: Map[String, List[String]] = words.map { case (w, _) => w -> w.split("").toList }
    val merges = mutable.ListBuffer[(String, String, Long)]()
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, f) <- words; ts = seg(w); i <- 0 until ts.length - 1)
        counts((ts(i), ts(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        seg = seg.map { case (w, ts) => w -> greedyApply(ts, l, r) }
        k += 1
      }
    }
    (merges.toList, seg)
  }

  private def wordsDf(m: Map[String, Long]) = {
    import spark.implicits._
    m.toSeq.toDF("word", "freq")
  }

  private def segOf(toks: org.apache.spark.sql.DataFrame): Map[String, List[String]] = {
    import spark.implicits._
    Bpe.segmentation(toks).select(col("word"), split(col("toks"), "\\|").as("ts"))
      .as[(String, Seq[String])].collect().toMap.view.mapValues(_.toList).toMap
  }

  test("hand-checked toy vocabulary") {
    val words = Map("abab" -> 10L, "ab" -> 5L, "ba" -> 3L)
    val (merges, toks) = Bpe.train(wordsDf(words), 2)
    assert(merges.map(m => (m.pair_left, m.pair_right, m.pair_count)) ==
      List(("a", "b", 25L), ("ab", "ab", 10L)))
    assert(segOf(toks) == Map("abab" -> List("abab"), "ab" -> List("ab"), "ba" -> List("b", "a")))
  }

  test("repeated-symbol runs follow greedy left-to-right semantics") {
    // (a,a) runs: greedy merges positions 1-2 and 3-4 of 'aaaa', leaves
    // the odd tail of 'aaa' — the exact case the run-parity window must
    // get right
    val words = Map("aaaa" -> 2L, "aaa" -> 3L, "aa" -> 5L, "ab" -> 1L)
    val (merges, toks) = Bpe.train(wordsDf(words), 2)
    val (refM, refSeg) = refTrain(words, 2)
    assert(merges.map(m => (m.pair_left, m.pair_right, m.pair_count)) == refM)
    assert(segOf(toks) == refSeg)
    // after ONE merge of (a,a): odd-length runs keep their greedy tail
    val (_, t1) = Bpe.train(wordsDf(words), 1)
    assert(segOf(t1)("aaaa") == List("aa", "aa"))
    assert(segOf(t1)("aaa") == List("aa", "a"))
  }

  test("matches the sequential reference on the real corpus") {
    import spark.implicits._
    val words = Bpe.wordFrequencies(Tables.documents(spark, sf0001), "text")
    val wordMap = words.as[(String, Long)].collect().toMap
    val (merges, toks) = Bpe.train(words, 5)
    val (refM, refSeg) = refTrain(wordMap, 5)
    assert(merges.map(m => (m.pair_left, m.pair_right, m.pair_count)) == refM)
    assert(segOf(toks) == refSeg)
  }

  test("segment() with learned merges reproduces the training segmentation") {
    val words = wordsDf(Map("abab" -> 10L, "ab" -> 5L, "ba" -> 3L, "bbbb" -> 2L))
    val (merges, toks) = Bpe.train(words, 3)
    assert(segOf(Bpe.segment(words, merges)) == segOf(toks))
  }

  test("training is invariant under input partitioning") {
    val words = Bpe.wordFrequencies(Tables.documents(spark, sf0001), "text")
    val (m1, _) = Bpe.train(words, 3)
    val (m2, _) = Bpe.train(words.repartition(7), 3)
    assert(m1 == m2)
  }

  test("training windows are all word-partitioned — no global single-task window") {
    val words = Bpe.wordFrequencies(Tables.documents(spark, sf0001), "text")
    val merged = Bpe.applyMerge(Bpe.charTokens(words), "a", "b")
    val windows = merged.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "every BPE window must partition by word")
    // pair counting is a two-phase aggregate: map-side combine absorbs
    // the Zipf head before the shuffle
    val counts = Bpe.wordFrequencies(Tables.documents(spark, sf0001), "text")
    val p = counts.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"word counting must be partial+final:\n$p")
  }

  test("persisted artifact: write/read roundtrip and train-once ≡ retrain") {
    val words = Bpe.wordFrequencies(Tables.documents(spark, sf0001), "text")
    val (merges, toks) = Bpe.train(words, 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe-artifact-").toString
    Bpe.writeMerges(spark, merges, s"$dir/merges")
    Bpe.writeVocabToks(toks, s"$dir/toks")
    // the merge list survives persistence exactly, in step order
    assert(Bpe.readMerges(spark, s"$dir/merges") == merges)
    // applying the PERSISTED merges to fresh char tokens reproduces the
    // training segmentation — so a stored tokenizer replaces retraining
    val applied = segOf(Bpe.segment(words, Bpe.readMerges(spark, s"$dir/merges")))
    assert(applied == segOf(toks))
    // and the persisted vocabulary segmentation reads back unchanged
    assert(segOf(spark.read.parquet(s"$dir/toks")) == segOf(toks))
  }

  test("train stops early when the vocabulary is fully merged") {
    val words = wordsDf(Map("ab" -> 1L))
    val (merges, toks) = Bpe.train(words, 10)
    assert(merges.size == 1) // one merge fuses the only pair; nothing left
    assert(segOf(toks) == Map("ab" -> List("ab")))
  }
}
