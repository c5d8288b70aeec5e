package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact substring-span deduplication (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499):
  * whole-document dedup (dd1) and near-dup (dd2/dd4) miss the common
  * case of a long span repeated INSIDE otherwise-distinct documents
  * (boilerplate, licenses, quoted text). The suffix-array pass of the
  * paper marks any k-token span whose text occurred earlier in the
  * corpus; this operator computes the same span flags relationally:
  * every k-gram occurrence is ranked by global first occurrence
  * ((doc_id, pos) order), and occurrences with rank > 1 mark their k
  * token positions as duplicated. Output is per-document duplicated-
  * token coverage — the quantity a curation pipeline thresholds on (or
  * uses to cut the flagged spans).
  *
  * Scale shape: the only corpus-wide operation is a groupBy/window
  * keyed by the k-gram. Ranking is applied AFTER a count-based
  * semi-join keeps only grams occurring ≥ 2 times — the same
  * Zipf-head guard as dd4's two-phase aggregate: the first groupBy is
  * map-side-combinable, and the window runs over the (far smaller)
  * duplicated-gram slice only. Span→position fan-out is a bounded
  * explode (factor k) on flagged occurrences only.
  */
object SubstringDedup {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** (idCol, __w): whitespace tokens per doc — the shared split. */
  private[operators] def tokenFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(col(textCol)).as("__w"))

  /** Positional k-grams (idCol, __pos, __gram): every k-token window
    * of every document, 1-based start position. Docs shorter than k
    * emit nothing. Map-side: one bounded explode over the scan. */
  private[operators] def positionalGrams(t: DataFrame, idCol: String, k: Int): DataFrame =
    t.filter(size(col("__w")) >= k)
      .select(col(idCol), posexplode(
        expr(s"transform(sequence(1, size(__w) - ${k - 1}), i -> concat_ws(' ', slice(__w, i, $k)))"))
        .as(Seq("__p0", "__gram")))
      .select(col(idCol), (col("__p0") + 1).cast(LongType).as("__pos"), col("__gram"))

  /** Distinct covered positions (idCol, __idx) from flagged (idCol,
    * __pos) span starts — merges overlapping [pos, pos+k-1] spans via
    * a bounded k-explode on flagged rows only. THE definition of
    * "covered" shared by the coverage metric and the cut step (the
    * CutSpans spec pins n_tokens - n_kept == dup_tokens, which holds
    * only while both build on this frame). */
  private def coveredPositions(flagged: DataFrame, idCol: String, k: Int): DataFrame =
    flagged
      .select(col(idCol), explode(expr(s"sequence(__pos, __pos + ${k - 1})")).as("__idx"))
      .distinct()

  /** Coverage count per doc from flagged (idCol, __pos) span starts. */
  private[operators] def coverageOf(t: DataFrame, flagged: DataFrame, idCol: String,
      k: Int, outCol: String): DataFrame = {
    val covered = coveredPositions(flagged, idCol, k)
      .groupBy(col(idCol)).agg(count(lit(1)).as(outCol))
    t.select(col(idCol), size(col("__w")).cast(LongType).as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col(outCol), lit(0L)).as(outCol))
  }

  /** Flagged duplicate-span starts (idCol, __pos): every k-gram
    * occurrence whose text occurred earlier in the corpus (earlier =
    * lower (doc_id, pos)) — shared by the coverage metric and the cut. */
  private def flaggedSpans(t: DataFrame, idCol: String, k: Int): DataFrame = {
    val grams = positionalGrams(t, idCol, k)
    // phase 1: duplicated grams only (two-phase agg; Zipf head stays
    // out of the window below)
    val dupGrams = grams.groupBy(col("__gram")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("__gram"))
    val wFirst = Window.partitionBy(col("__gram")).orderBy(col(idCol), col("__pos"))
    grams.join(dupGrams, Seq("__gram"), "left_semi")
      .withColumn("__rn", row_number().over(wFirst))
      .filter(col("__rn") > 1)
  }

  /** Per-document duplicated-span coverage: (idCol, n_tokens,
    * dup_tokens) where dup_tokens counts token positions covered by at
    * least one k-gram whose text occurred earlier in the corpus.
    * Documents shorter than k carry dup_tokens = 0. */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val t = tokenFrame(docs, idCol, textCol)
    coverageOf(t, flaggedSpans(t, idCol, k), idCol, k, "dup_tokens")
  }

  /** The CUT step of Lee et al.: rewrite each document with every
    * duplicated k-token span REMOVED (the paper's ExactSubstr
    * deduplication — keep the first occurrence corpus-wide, delete the
    * text of every later one). Returns (idCol, n_tokens, n_kept,
    * clean_text): the whitespace-normalized text of the surviving
    * token positions, '' when everything was cut. Scale shape: the
    * rebuild is one anti-join of the positional token explode against
    * the covered-position set (both keyed by (doc, position)) and a
    * per-document sort-aggregate — no global window, no text shuffle
    * beyond the doc-keyed groupBy. */
  /** DuckDB oracle fragments shared by the dd9/dd12 gates (dc2 reuses
    * the tokenize/gram/cov pieces with its own benchmark `flagged`).
    * ONE copy so the oracles can never diverge from each other: a
    * tokenization or window change edits these strings once. */
  // toksq: whitespace tokens per documents row; grams: positional
  // k-grams, 1-based (the SQL twin of tokenFrame + positionalGrams)
  def toksGramsSqlCtes(k: Int): String = s"""toksq AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, i AS pos, array_to_string(w[i:i+${k - 1}], ' ') AS gram
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${k - 2})) AS i
                FROM toksq WHERE len(w) >= $k))"""

  // flagged: occurrences whose gram text occurred earlier ((doc, pos)
  // rank > 1) — the SQL twin of flaggedSpans
  def dupFlaggedSqlCte: String = """flagged AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
            FROM grams) WHERE rn > 1)"""

  // cov: distinct covered token positions — the twin of coveredPositions
  def covSqlCte(k: Int): String = s"""cov AS (
          SELECT DISTINCT doc_id, pos + o AS idx
          FROM flagged, unnest(range(0, $k)) AS t(o))"""

  // toks_pos/kept/r: rebuild each doc from positions not in cov — the
  // twin of cutFlagged. `whereDocs` optionally restricts the rebuilt
  // doc set (e.g. the dc3 corpus slice); pass "" for all docs.
  def cutRebuildSqlCtes(whereDocs: String): String = s"""toks_pos AS (
          SELECT doc_id, i AS idx, list_extract(w, i) AS tok
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM toksq $whereDocs)),
        kept AS (
          SELECT p.doc_id, p.idx, p.tok
          FROM toks_pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.idx = p.idx
          WHERE c.idx IS NULL),
        r AS (
          SELECT doc_id, count(*) AS n_kept,
                 array_to_string(list(tok ORDER BY idx), ' ') AS clean_text
          FROM kept GROUP BY doc_id)"""

  def cutSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val t = tokenFrame(docs, idCol, textCol)
    cutFlagged(t, flaggedSpans(t, idCol, k), idCol, k)
  }

  /** The positional rebuild shared by the dedup cut (dd12) and the
    * decontamination cut (dc3): given flagged (idCol, __pos) span
    * starts over token frame `t`, rewrite each document without the
    * covered positions. */
  private[operators] def cutFlagged(t: DataFrame, flagged: DataFrame,
      idCol: String, k: Int): DataFrame = {
    val covered = coveredPositions(flagged, idCol, k)
    val kept = t.select(col(idCol), posexplode(col("__w")).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast(LongType).as("__idx"), col("__tok"))
      .join(covered, Seq(idCol, "__idx"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("__idx"), col("__tok")))),
          x => x.getField("__tok")), " ").as("clean_text"))
    t.select(col(idCol), size(col("__w")).cast(LongType).as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
