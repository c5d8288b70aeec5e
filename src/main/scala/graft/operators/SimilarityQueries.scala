package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.similarity.{OriginCountry, Priorities}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gate queries for the two similarity estimators (SURVEY §2.10
  * D3/D4), driving the REAL library kernels
  * ([[graft.similarity.OriginCountry]], [[graft.similarity.Priorities]])
  * over testdata-derived aligned sequences, with DuckDB oracles that
  * replicate the merge-distance semantics over pre-exploded
  * (id, position, base) tables.
  *
  * Oracle-expressibility of D3's early-break merge
  * (`OriginCountryEstimator.java:230-271`): the loop consumes positions
  * in ascending union order and stops after the last element of the
  * list that ends first, so the visited set is exactly
  * {p ∈ mutA ∪ mutB : p ≤ least(max(mutA), max(mutB))} — a relational
  * filter. An empty mutation list ⇒ the loop never runs ⇒ distance 0
  * (coalesce(max, 0)).
  */
object SimilarityQueries extends QueryModule {

  private val REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" // 60

  // D3: k-NN origin estimator. 3 fixed reference sets (doc_id < 60,
  // set k = doc_id % 5 for k ∈ 0..2, ordered by doc_id — the Seq order
  // IS the tie-break), country := lang; queries are every other doc.
  // The reference sets are bounded (O(1) in corpus size) so the
  // driver-side collect + broadcast is the designed 100 TB shape: the
  // query corpus streams against them without shuffling.
  private val d3 = Q(
    "q_d3_origin_knn",
    "D3 k-NN origin estimator: 3 broadcast reference sets, early-break merge distance, majority vote",
    (s, d) => {
      val seqs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        rpad(substring(lower(col("text")), 1, 60), 60, "n").as("seq"))
      val refRows = seqs.filter(col("doc_id") < 60 && pmod(col("doc_id"), lit(5)) < 3)
        .collect().sortBy(_.getAs[Long]("doc_id"))
      val refSets = (0 until 3).map(k => refRows.toSeq
        .filter(_.getAs[Long]("doc_id") % 5 == k)
        .map(r => OriginCountry.encode(r.getAs[Long]("doc_id").toString,
          r.getAs[String]("lang"), REF, r.getAs[String]("seq"))))
      val queries = seqs.filter(col("doc_id") >= 60 || pmod(col("doc_id"), lit(5)) >= 3)
      val est = OriginCountry.estimate(s, queries, refSets)(r =>
        OriginCountry.encode(r.getAs[Long]("doc_id").toString,
          r.getAs[String]("lang"), REF, r.getAs[String]("seq")))
      OriginCountry.majorityVote(est)
        .select(col("id").cast(LongType).as("doc_id"),
          col("estimated_country"), col("n_votes"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH seqs AS (
        SELECT doc_id, lang, upper(rpad(substring(lower(text), 1, 60), 60, 'n')) AS seq
        FROM documents),
      pos AS (SELECT doc_id, seq, unnest(range(1, 61)) AS p FROM seqs),
      muts AS (
        SELECT doc_id, p, substring(seq, p, 1) AS b FROM pos
        WHERE substring(seq, p, 1) IN ('A','C','G','T','-')
          AND substring(seq, p, 1) <> substring('$REF', p, 1)),
      unk AS (
        SELECT doc_id, p FROM pos
        WHERE substring(seq, p, 1) NOT IN ('A','C','G','T','-')),
      mx AS (SELECT doc_id, max(p) AS mx FROM muts GROUP BY doc_id),
      refs AS (
        SELECT doc_id AS rid, doc_id % 5 AS k, lang AS rcountry FROM seqs
        WHERE doc_id < 60 AND doc_id % 5 < 3),
      qs AS (SELECT doc_id AS qid FROM seqs WHERE doc_id >= 60 OR doc_id % 5 >= 3),
      qr AS (SELECT qid, rid, k, rcountry FROM qs CROSS JOIN refs),
      am AS (SELECT qr.qid, qr.rid, m.p, m.b FROM qr JOIN muts m ON m.doc_id = qr.qid),
      bm AS (SELECT qr.qid, qr.rid, m.p, m.b FROM qr JOIN muts m ON m.doc_id = qr.rid),
      merged AS (
        SELECT coalesce(a.qid, b.qid) AS qid, coalesce(a.rid, b.rid) AS rid,
               coalesce(a.p, b.p) AS p, a.b AS ab, b.b AS bb
        FROM am a FULL JOIN bm b ON a.qid = b.qid AND a.rid = b.rid AND a.p = b.p),
      counted AS (
        SELECT m.qid, m.rid, count(*) AS d
        FROM merged m
        LEFT JOIN mx mq ON mq.doc_id = m.qid
        LEFT JOIN mx mr ON mr.doc_id = m.rid
        LEFT JOIN unk uq ON uq.doc_id = m.qid AND uq.p = m.p
        LEFT JOIN unk ur ON ur.doc_id = m.rid AND ur.p = m.p
        WHERE m.p <= least(coalesce(mq.mx, 0), coalesce(mr.mx, 0))
          AND ((m.ab IS NOT NULL AND m.bb IS NOT NULL AND m.ab <> m.bb)
            OR (m.ab IS NOT NULL AND m.bb IS NULL AND ur.p IS NULL)
            OR (m.bb IS NOT NULL AND m.ab IS NULL AND uq.p IS NULL))
        GROUP BY 1, 2),
      dist AS (
        SELECT qr.qid, qr.rid, qr.k, qr.rcountry, coalesce(c.d, 0) AS d
        FROM qr LEFT JOIN counted c ON c.qid = qr.qid AND c.rid = qr.rid),
      best AS (
        SELECT qid, k, rcountry,
               row_number() OVER (PARTITION BY qid, k ORDER BY d ASC, rid ASC) AS rn
        FROM dist),
      votes AS (
        SELECT qid, rcountry AS estimated_country, count(*) AS n_votes
        FROM best WHERE rn = 1 GROUP BY 1, 2)
      SELECT qid AS doc_id, estimated_country, CAST(n_votes AS BIGINT) AS n_votes
      FROM (SELECT *, row_number() OVER (PARTITION BY qid
              ORDER BY n_votes DESC, estimated_country ASC) AS vrn FROM votes)
      WHERE vrn = 1 ORDER BY doc_id"""))

  // D4: genetic priority scorer. Focal set = doc_id < 20 (ordered by
  // doc_id — the Seq order IS the closest-focal tie-break), contexts =
  // the rest; full-merge pairsnp distance, mask penalties, per-focal
  // crowding rank. String id ordering in the crowding window is
  // replicated with CAST(... AS VARCHAR) in the oracle.
  private val d4 = Q(
    "q_d4_priority_score",
    "D4 genetic priority scorer: broadcast focal set, pairsnp distance + mask penalty + crowding rank",
    (s, d) => {
      val seqs = Tables.documents(s, d).select(col("doc_id"),
        rpad(substring(lower(col("text")), 1, 60), 60, "n").as("seq"))
      val focals = seqs.filter(col("doc_id") < 20)
        .collect().sortBy(_.getAs[Long]("doc_id"))
        .map(r => Priorities.encode(r.getAs[Long]("doc_id").toString, REF,
          r.getAs[String]("seq"))).toSeq
      val contexts = seqs.filter(col("doc_id") >= 20)
      Priorities.score(s, contexts, focals, 60)(r =>
        Priorities.encode(r.getAs[Long]("doc_id").toString, REF, r.getAs[String]("seq")))
        .orderBy(col("context_id"))
    },
    Some(s"""
      WITH seqs AS (
        SELECT doc_id, rpad(substring(lower(text), 1, 60), 60, 'n') AS seq
        FROM documents),
      pos AS (SELECT doc_id, seq, unnest(range(1, 61)) AS p FROM seqs),
      chars AS (SELECT doc_id, p, substring(seq, p, 1) AS c FROM pos),
      snp AS (
        SELECT doc_id, p, c FROM chars
        WHERE c IN ('a','c','g','t') AND c <> substring('${REF.toLowerCase}', p, 1)),
      mask AS (
        SELECT doc_id, count(*) AS m FROM chars
        WHERE c NOT IN ('a','c','g','t') GROUP BY doc_id),
      foc AS (SELECT doc_id AS fid FROM seqs WHERE doc_id < 20),
      ctx AS (SELECT doc_id AS cid FROM seqs WHERE doc_id >= 20),
      pairs AS (SELECT cid, fid FROM ctx CROSS JOIN foc),
      am AS (SELECT pr.cid, pr.fid, s.p, s.c FROM pairs pr JOIN snp s ON s.doc_id = pr.cid),
      bm AS (SELECT pr.cid, pr.fid, s.p, s.c FROM pairs pr JOIN snp s ON s.doc_id = pr.fid),
      merged AS (
        SELECT coalesce(a.cid, b.cid) AS cid, coalesce(a.fid, b.fid) AS fid,
               a.c AS ac, b.c AS bc
        FROM am a FULL JOIN bm b ON a.cid = b.cid AND a.fid = b.fid AND a.p = b.p),
      counted AS (
        SELECT cid, fid, count(*) AS d FROM merged
        WHERE ac IS NULL OR bc IS NULL OR ac <> bc
        GROUP BY 1, 2),
      dist AS (
        SELECT pr.cid, pr.fid, coalesce(c.d, 0) AS d,
               coalesce(fm.m, 0) AS fmask, coalesce(cm.m, 0) AS cmask
        FROM pairs pr
        LEFT JOIN counted c ON c.cid = pr.cid AND c.fid = pr.fid
        LEFT JOIN mask fm ON fm.doc_id = pr.fid
        LEFT JOIN mask cm ON cm.doc_id = pr.cid),
      closest AS (
        -- double (not DECIMAL) math to mirror Spark's `d + mask/L` op order
        SELECT cid, fid, d, cmask,
               row_number() OVER (PARTITION BY cid
                 ORDER BY (d + fmask / CAST(60.0 AS DOUBLE)) ASC, fid ASC) AS rn
        FROM dist),
      ranked AS (
        SELECT cid, fid, d,
               row_number() OVER (PARTITION BY fid
                 ORDER BY (d + cmask / CAST(60.0 AS DOUBLE)) ASC, CAST(cid AS VARCHAR) ASC) - 1 AS rank0
        FROM closest WHERE rn = 1)
      SELECT CAST(cid AS VARCHAR) AS context_id, CAST(fid AS VARCHAR) AS focal_id,
             CAST(d AS INTEGER) AS distance,
             (-CAST(d AS DOUBLE) - CAST(0.1 AS DOUBLE) * rank0) AS priority
      FROM ranked ORDER BY context_id"""))

  override val all: Seq[Q] = Seq(d3, d4)
}
