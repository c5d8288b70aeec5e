package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators over the documents table: language ID,
  * quality scoring, token counting, fingerprinting. All pure
  * column-expression pipelines (whole-stage codegen; the scan reads
  * only doc_id+text).
  */
object TextQueries extends QueryModule {

  private def markerSql(markers: Seq[String]): String =
    markers.map(m => s"'$m'").mkString(", ")

  private val tx1 = {
    val sorted = langMarkers.toSeq.sortBy(_._1)
    val scoreCols = sorted.map { case (l, m) =>
      s"len(list_filter(string_split(text, ' '), t -> t IN (${markerSql(m)}))) AS s_$l"
    }.mkString(", ")
    val top = s"greatest(${sorted.map(x => "s_" + x._1).mkString(", ")})"
    val caseArms = sorted.map { case (l, _) =>
      s"WHEN s_$l = $top THEN '$l'"
    }.mkString(" ")
    Q(
      "q_tx1_langid",
      "heuristic language-ID: marker-token counts, argmax with alphabetical tie-break",
      (s, d) => Tables.documents(s, d)
        // one split per row, shared across the 4 marker counts
        .withColumn("__toks", split(col("text"), " "))
        .select(col("doc_id"), langIdFromTokens(col("__toks")).as("pred_lang"),
          col("lang").as("labeled_lang"))
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               CASE WHEN $top = 0 THEN 'und' $caseArms ELSE 'und' END AS pred_lang,
               lang AS labeled_lang
        FROM (SELECT doc_id, text, lang, $scoreCols FROM documents)
        ORDER BY doc_id"""))
  }

  private val tx2 = Q(
    "q_tx2_quality_score",
    "document quality score: token-count/stopword/word-length mix (deterministic double math)",
    (s, d) => Tables.documents(s, d)
      .withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"),
        qualityScoreFromTokens(col("text"), col("__toks")).as("quality"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, ${qualityScoreSql("text")} AS quality
      FROM documents ORDER BY doc_id"""))

  private val tx3 = Q(
    "q_tx3_token_count",
    "token counting: whitespace tokens + BPE-ish regex pieces + chars",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$bpeishPattern', 0)")).cast(LongType).as("bpeish_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws_tokens,
             len(regexp_extract_all(text, '$bpeishPattern')) AS bpeish_tokens,
             length(text) AS n_chars
      FROM documents ORDER BY doc_id"""))

  private val tx4 = Q(
    "q_tx4_fingerprint",
    "canonical-form md5 document fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id"""))

  override val all: Seq[Q] = Seq(tx1, tx2, tx3, tx4)
}
