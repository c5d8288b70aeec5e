package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data op that keeps eval
  * sets out of the corpus: a document is contaminated when it shares
  * at least `minHits` distinct word n-grams with ANY benchmark
  * document. The scale shape exploits the asymmetry: benchmarks are
  * tiny (thousands of docs) next to the corpus (billions), so the
  * benchmark n-gram set BROADCASTS and the corpus side is one scan +
  * shingle explode + broadcast semi-join + groupBy — no corpus-side
  * self-join, no shuffle of the corpus text. 13-gram overlap with
  * ≥1 hit is the published convention (GPT-3 appendix C / PaLM §6.1);
  * n and the hit threshold are parameters because real pipelines tune
  * both.
  */
object Decontamination {

  /** (id, n_hits) per contaminated corpus doc: distinct n-gram overlap
    * counts against the broadcast benchmark n-gram set. */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, minHits: Long): DataFrame = {
    val bGrams = wordShingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    wordShingles(corpus, idCol, textCol, n)
      .join(broadcast(bGrams), Seq("shingle"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // shingles are distinct per doc
      .filter(col("n_hits") >= minHits)
  }

  /** Clean corpus: drop contaminated docs. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13, minHits: Long = 1L): DataFrame =
    corpus.join(contaminationHits(corpus, benchmark, idCol, textCol, n, minHits)
      .select(col(idCol)), Seq(idCol), "left_anti")

  /** Shared flagging: (corpus token frame, benchmark-matching span
    * starts). ONE definition so the dc2 metric and the dc3 cut can
    * never diverge (their spec invariant n_tokens − n_kept ==
    * contam_tokens depends on it). */
  private def benchmarkFlagged(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): (DataFrame, DataFrame) = {
    val bGrams = SubstringDedup.positionalGrams(
        SubstringDedup.tokenFrame(benchmark, idCol, textCol), idCol, n)
      .select(col("__gram")).distinct()
    val t = SubstringDedup.tokenFrame(corpus, idCol, textCol)
    val flagged = SubstringDedup.positionalGrams(t, idCol, n)
      .join(broadcast(bGrams), Seq("__gram"), "left_semi")
    (t, flagged)
  }

  /** Span-level contamination COVERAGE — the fraction-of-tokens metric
    * contamination reports quote (PaLM §6.1 reports both doc counts and
    * token fractions): per corpus doc, (idCol, n_tokens, contam_tokens)
    * where contam_tokens counts token positions covered by at least one
    * n-gram that appears anywhere in the benchmark. Same asymmetric
    * shape as [[contaminationHits]] — benchmark grams broadcast, corpus
    * pays one positional-gram explode + broadcast semi-join + a bounded
    * k-explode on flagged spans only; no window, no corpus shuffle
    * before the final per-doc count. */
  def spanContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val (t, flagged) = benchmarkFlagged(corpus, benchmark, idCol, textCol, n)
    SubstringDedup.coverageOf(t, flagged, idCol, n, "contam_tokens")
  }

  /** The CUT step of span-level decontamination (dc2 measures; this
    * REWRITES): every corpus n-gram span whose text appears in the
    * benchmark is removed, keeping the rest of the document — the
    * surgical alternative to dropping whole contaminated documents
    * (dc1) when only a quoted snippet overlaps the eval set. Same
    * plan shape as dc2 (benchmark grams broadcast, bounded explodes)
    * feeding the dd12 positional rebuild. Returns (idCol, n_tokens,
    * n_kept, clean_text). */
  def cutContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val (t, flagged) = benchmarkFlagged(corpus, benchmark, idCol, textCol, n)
    SubstringDedup.cutFlagged(t, flagged, idCol, n)
  }
}
