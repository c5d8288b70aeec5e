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

  // The composed curation funnel (jobs/CorpusCuration) as a gate query:
  // stats → quality/lang gate → exact dedup → MinHash-LSH near-dup.
  // The oracle is the chain of the already-verified tx1/tx2/dd1/dd2
  // fragments run over the same stages.
  private val llm1 = {
    val sorted = langMarkers.toSeq.sortBy(_._1)
    val scoreCols = sorted.map { case (l, m) =>
      s"len(list_filter(string_split(text, ' '), t -> t IN (${markerSql(m)}))) AS s_$l"
    }.mkString(", ")
    val top = s"greatest(${sorted.map(x => "s_" + x._1).mkString(", ")})"
    val caseArms = sorted.map { case (l, _) => s"WHEN s_$l = $top THEN '$l'" }.mkString(" ")
    Q(
      "q_llm1_corpus_curation",
      "end-to-end corpus curation funnel: stats, gate, exact dedup, LSH near-dup",
      (s, d) => {
        val (curated, _) = graft.jobs.CorpusCuration.run(Tables.documents(s, d))
        curated.select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH stats AS (
          SELECT doc_id, text,
                 ${qualityScoreSql("text")} AS quality,
                 CASE WHEN $top = 0 THEN 'und' $caseArms ELSE 'und' END AS pred_lang,
                 len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
          FROM (SELECT doc_id, text, $scoreCols FROM documents)),
        gated AS (
          SELECT * FROM stats
          WHERE quality >= 0.3 AND pred_lang IN ('de','en','es','fr')),
        keepers AS (
          SELECT doc_id, text, quality, pred_lang, n_tokens FROM (
            SELECT *, row_number() OVER (
              PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
              ORDER BY doc_id) AS rn
            FROM gated) WHERE rn = 1),
        toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
          FROM keepers),
        sh AS (
          SELECT DISTINCT doc_id, list_extract(w, i) || ' ' || list_extract(w, i + 1) AS shingle
          FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                FROM toks WHERE len(w) >= 2)),
        sig AS (
          SELECT doc_id,
            min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
            min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
            min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
            min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
          FROM sh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS band_key FROM sig
          UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
          UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
          UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.da, c.db, count(*) AS ninter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.da
          JOIN sh sb ON sb.doc_id = c.db AND sb.shingle = sa.shingle
          GROUP BY c.da, c.db),
        dup AS (
          SELECT DISTINCT i.db AS doc_id
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.da
          JOIN sizes sb ON sb.doc_id = i.db
          WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.7)
        SELECT k.doc_id, k.pred_lang, k.quality, k.n_tokens
        FROM keepers k LEFT JOIN dup d ON k.doc_id = d.doc_id
        WHERE d.doc_id IS NULL ORDER BY k.doc_id"""))
  }

  override val all: Seq[Q] = Seq(tx1, tx2, tx3, tx4, llm1)
}
