package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Learned quality filtering — the CCNet / fastText move (Wenzek et
  * al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data"; Joulin et al. 2017): train a lightweight
  * classifier on a high-quality REFERENCE corpus vs the raw
  * BACKGROUND, then keep background documents that look
  * reference-like. The heuristic scores (tx2) are unsupervised; this
  * is the supervised rung of the quality ladder.
  *
  * Model: unigram multinomial over HASHED features (fastText's hashing
  * trick — md5-bucketed words, B buckets). Hashing is what makes the
  * operator scale: the trained model is AT MOST B rows regardless of
  * corpus size, so scoring is one broadcast join — map-side over a
  * 100 TB crawl, no vocabulary shuffle ever.
  *
  * Two scorers over the same model:
  *  - [[scoreLogOdds]] — the production form: mean per-token
  *    Laplace-smoothed log-likelihood ratio (the textbook NB / CCNet
  *    perplexity-style score). Float math: fast, rankable, NOT
  *    bit-reproducible across engines.
  *  - [[classifyExact]] — the gate form: compares MEAN per-token
  *    likelihoods (arithmetic mean instead of NB's geometric mean) and
  *    cross-multiplies into BIGINT, so the decision is integer-exact in
  *    any engine: target-like ⇔ Σ(a_f+1)·(S_b+B) ≥ Σ(b_f+1)·(S_a+B).
  *    Same float-vs-exact twin discipline as dd5/dd6. Bound: the
  *    products stay inside BIGINT while n_tokens·max_bucket_count·
  *    (S+B) < 2^63 — holds far past gate scale; at full crawl scale
  *    use scoreLogOdds (doubles don't overflow) for ranking.
  */
object QualityClassifier {

  /** Feature buckets: fixed model size AND the smoothing vocabulary. */
  val Buckets = 65536

  /** md5 feature bucket of a word. */
  def featureBucket(word: Column): Column =
    Sketches.md5Long56(concat(lit("f:"), word)) % Buckets

  def featureBucketSql(wordExpr: String): String =
    s"${Sketches.md5Long56Sql(s"'f:' || $wordExpr")} % $Buckets"

  /** Trained model: per feature bucket, token counts in the target
    * (reference) slice and the background. ≤ B rows — broadcastable.
    * One map-side-combinable conditional aggregate over the corpus. */
  def train(docs: DataFrame, textCol: String, isTarget: Column): DataFrame =
    docs.select(isTarget.as("__t"), explode(tokens(col(textCol))).as("__w"))
      .select(col("__t"), featureBucket(col("__w")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("cnt_t"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("cnt_b"))
      // a trained model is a materialized artifact: checkpoint so
      // totalsOf and the scoring join(s) never re-run the corpus
      // tokenize+aggregate (it is ≤ Buckets rows by construction)
      .localCheckpoint()

  private case class Totals(sT: Long, sB: Long)

  private def totalsOf(model: DataFrame): Totals = {
    val r = model.agg(sum(col("cnt_t")), sum(col("cnt_b"))).head()
    Totals(r.getLong(0), r.getLong(1))
  }

  /** Per-document mean log-likelihood ratio (production scorer):
    * score = (1/n) Σ_tokens [ln((a_f+1)/(S_a+B)) − ln((b_f+1)/(S_b+B))].
    * Positive ⇒ reference-like. Broadcast model join; map-side. */
  def scoreLogOdds(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val t = totalsOf(model)
    val lnT = log((col("cnt_t") + 1).cast(DoubleType) / lit((t.sT + Buckets).toDouble))
    val lnB = log((col("cnt_b") + 1).cast(DoubleType) / lit((t.sB + Buckets).toDouble))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol), featureBucket(col("__w")).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .select(col(idCol),
        (coalesce(lnT, log(lit(1.0 / (t.sT + Buckets)))) -
          coalesce(lnB, log(lit(1.0 / (t.sB + Buckets))))).as("__llr"))
      .groupBy(col(idCol))
      .agg(avg(col("__llr")).as("score"))
  }

  /** Integer-exact decision (gate form): per document emit the
    * cross-multiplied mean-likelihood comparison
    * like_num = Σ(a_f+1)·(S_b+B), like_den = Σ(b_f+1)·(S_a+B),
    * target_like = 1 iff like_num ≥ like_den (empty docs are never
    * target-like). Every quantity BIGINT. */
  def classifyExact(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val t = totalsOf(model)
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol),
        coalesce(size(col("__ws")), lit(0)).cast(LongType).as("n_tokens"),
        explode_outer(col("__ws")).as("__w"))
      .select(col(idCol), col("n_tokens"),
        when(col("__w").isNotNull, featureBucket(col("__w"))).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col(idCol), col("n_tokens"))
      .agg(
        sum(when(col("bucket").isNotNull, coalesce(col("cnt_t"), lit(0L)) + 1L)
          .otherwise(0L)).as("__sa"),
        sum(when(col("bucket").isNotNull, coalesce(col("cnt_b"), lit(0L)) + 1L)
          .otherwise(0L)).as("__sb"))
      .select(col(idCol), col("n_tokens"),
        (col("__sa") * lit(t.sB + Buckets)).as("like_num"),
        (col("__sb") * lit(t.sT + Buckets)).as("like_den"))
      .withColumn("target_like",
        (col("n_tokens") > 0 && col("like_num") >= col("like_den")).cast(LongType))
  }
}

/** Learned-quality gate. q_qc1: train on the doc_id % 11 == 0 slice as
  * the reference corpus (dc1's split convention — at gate scale it
  * stands in for "a curated corpus"), classify every background doc. */
object QualityClassifierQueries extends QueryModule {
  import QualityClassifier._

  // Persisted model artifact (the NgramLm/Bpe disk-tier discipline):
  // trained once per (sf dir, content fingerprint), read by every
  // later process — classifiers are shipped artifacts, not per-query
  // computations.
  private val modelSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bucket", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cnt_t", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cnt_b", LongType, nullable = false)))

  private def modelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"qualityclassifier:$d", d, modelSchema)(
      train(Tables.documents(s, d), "text", col("doc_id") % 11 === 0))

  private val qc1 = Q(
    "q_qc1_learned_quality",
    "learned quality filter: hashed-unigram classifier, reference slice vs background",
    (s, d) => {
      val docs = Tables.documents(s, d)
      classifyExact(docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text", modelOf(s, d))
        .orderBy(col("doc_id"))
    },
    Some {
      val fb = featureBucketSql("word")
      s"""
      WITH w AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents),
      f AS (SELECT doc_id, $fb AS bucket FROM w),
      model AS (
        SELECT bucket,
               CAST(sum(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
               CAST(sum(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
        FROM f GROUP BY bucket),
      tot AS (SELECT CAST(sum(cnt_t) AS BIGINT) AS s_t,
                     CAST(sum(cnt_b) AS BIGINT) AS s_b FROM model),
      toksq AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        FROM documents WHERE doc_id % 11 <> 0),
      sums AS (
        SELECT f.doc_id,
               CAST(sum(coalesce(m.cnt_t, 0) + 1) AS BIGINT) AS sa,
               CAST(sum(coalesce(m.cnt_b, 0) + 1) AS BIGINT) AS sb
        FROM f LEFT JOIN model m ON m.bucket = f.bucket
        WHERE f.doc_id % 11 <> 0
        GROUP BY f.doc_id)
      SELECT t.doc_id, CAST(coalesce(len(t.ws), 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(s.sa, 0) * (tot.s_b + $Buckets) AS BIGINT) AS like_num,
             CAST(coalesce(s.sb, 0) * (tot.s_t + $Buckets) AS BIGINT) AS like_den,
             CAST(CASE WHEN coalesce(len(t.ws), 0) > 0 AND
               coalesce(s.sa, 0) * (tot.s_b + $Buckets) >=
               coalesce(s.sb, 0) * (tot.s_t + $Buckets)
               THEN 1 ELSE 0 END AS BIGINT) AS target_like
      FROM toksq t CROSS JOIN tot
      LEFT JOIN sums s ON s.doc_id = t.doc_id
      ORDER BY t.doc_id"""
    })

  override val all: Seq[Q] = Seq(qc1)
}
