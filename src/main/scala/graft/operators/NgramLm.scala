package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** N-gram language-model scoring — the perplexity rung of the CCNet
  * quality ladder (Wenzek et al. 2020 §4.4 bucket documents by the
  * perplexity of a KenLM 5-gram model trained on Wikipedia; Heafield
  * 2011). [[QualityClassifier]] is the ladder's discriminative rung
  * (reference vs background); this is the generative one: train a
  * smoothed bigram model on the reference corpus alone and score every
  * background document by how well the model predicts it. Low scores =
  * out-of-domain tails, high = reference-like — the signal CCNet cuts
  * into head/middle/tail buckets.
  *
  * Model: HASHED bigram LM. Both the unigram context counts and the
  * bigram counts are md5-bucketed (the [[QualityClassifier]] hashing
  * trick applied to an LM): the trained model is at most 2·B rows
  * regardless of corpus size, so scoring is two broadcast joins —
  * map-side over a 100 TB crawl, no vocabulary shuffle ever. Add-one
  * smoothing over the B-bucket space: p(w2|w1) = (c2+1)/(c1+B).
  *
  * Integer-exact (the dd5/dd6/qc1 twin discipline): each bigram's
  * scaled likelihood is q = (10^6·(c2+1)) div (c1+B) and the document
  * score is mean(q) in floor division — BIGINT end to end (q ≤ 10^6,
  * Σq ≤ n_bigrams·10^6 ≪ 2^63), bit-reproducible in any engine, and
  * the whole pipeline unrolls into the DuckDB oracle. A float
  * log-perplexity twin for production ranking is [[scoreLogPpl]].
  *
  * Two smoothings share the pair frame: add-one ([[train]] /
  * [[scoreExact]] — the simplest correct rung) and interpolated
  * Kneser–Ney ([[trainKn]] / [[scoreKnExact]] — the smoothing real
  * KenLM-style filters use, built on continuation type counts).
  */
object NgramLm {

  /** Hash buckets for both the unigram-context and bigram spaces —
    * fixed model size AND the smoothing vocabulary. */
  val Buckets = 65536

  /** Likelihood scale: scores live in [0, 10^6]. */
  val Scale = 1000000L

  /** md5 bucket of a unigram context. Distinct tag keeps the unigram
    * and bigram spaces independent ([[QualityClassifier.featureBucket]]
    * uses "f:"). */
  def uniBucket(w: Column): Column =
    Sketches.md5Long56(concat(lit("u:"), w)) % Buckets

  /** md5 bucket of a bigram; ' ' is a safe separator (tokens are
    * whitespace-split, so no token contains one). */
  def biBucket(w1: Column, w2: Column): Column =
    Sketches.md5Long56(concat(lit("b:"), w1, lit(" "), w2)) % Buckets

  def uniBucketSql(wExpr: String): String =
    s"${Sketches.md5Long56Sql(s"'u:' || $wExpr")} % $Buckets"

  def biBucketSql(w1Expr: String, w2Expr: String): String =
    s"${Sketches.md5Long56Sql(s"'b:' || $w1Expr || ' ' || $w2Expr")} % $Buckets"

  /** (doc_id-preserving) adjacent-pair explode of `textCol`: one row
    * per bigram with the context (`ub` = w1), word (`vb` = w2, same
    * unigram bucket space as ub so a word hashes identically in both
    * roles) and bigram (`bb`) buckets attached; documents with fewer
    * than 2 tokens keep one all-null row (explode_outer) so they
    * survive to the final scoring frame. */
  private def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol),
        greatest(size(col("__ws")) - 1, lit(0)).cast(LongType).as("n_bigrams"),
        explode_outer(when(size(col("__ws")) >= 2,
          expr("transform(sequence(0, size(__ws) - 2), " +
            "i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"))).as("__p"))
      .select(col(idCol), col("n_bigrams"),
        uniBucket(col("__p.w1")).as("ub"), uniBucket(col("__p.w2")).as("vb"),
        biBucket(col("__p.w1"), col("__p.w2")).as("bb"))

  /** Trained model: (bucket, kind, cnt) with kind 0 = unigram context,
    * 1 = bigram — ≤ 2·B rows, broadcastable. Two map-side-combinable
    * aggregates over the reference slice; checkpointed like the
    * [[QualityClassifier.train]] artifact so scoring never re-runs the
    * tokenize+count. The LAST token of a document is not a bigram
    * context, so unigram counts come from the pair frame's w1 side —
    * keeping Σc1 = Σc2, the balance add-one smoothing assumes. */
  def train(docs: DataFrame, textCol: String, isRef: Column,
      idCol: String = "doc_id"): DataFrame = {
    val p = pairs(docs.filter(isRef), idCol, textCol).filter(col("ub").isNotNull)
    p.groupBy(col("ub").as("bucket")).agg(count(lit(1)).as("cnt"))
      .select(col("bucket"), lit(0L).as("kind"), col("cnt"))
      .unionAll(
        p.groupBy(col("bb").as("bucket")).agg(count(lit(1)).as("cnt"))
          .select(col("bucket"), lit(1L).as("kind"), col("cnt")))
      .localCheckpoint()
  }

  /** Integer-exact document score (gate form): per document emit
    * n_bigrams, lm_score = mean over bigrams of
    * (10^6·(c2+1)) div (c1+B) in floor division (0 when the document
    * has no bigram), and ref_like = 1 iff lm_score ≥ threshold. */
  def scoreExact(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, threshold: Long): DataFrame = {
    val uni = model.filter(col("kind") === 0L).select(col("bucket").as("ub"), col("cnt").as("c1"))
    val bi = model.filter(col("kind") === 1L).select(col("bucket").as("bb"), col("cnt").as("c2"))
    pairs(docs, idCol, textCol)
      .join(broadcast(uni), Seq("ub"), "left")
      .join(broadcast(bi), Seq("bb"), "left")
      .withColumn("__q", when(col("ub").isNull, lit(0L)).otherwise(
        expr(s"($Scale * (coalesce(c2, 0L) + 1L)) div (coalesce(c1, 0L) + $Buckets)")))
      .groupBy(col(idCol), col("n_bigrams"))
      .agg(sum(col("__q")).as("__sq"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") > 0, expr("__sq div n_bigrams"))
          .otherwise(lit(0L)).as("lm_score"))
      .withColumn("ref_like",
        (col("n_bigrams") > 0 && col("lm_score") >= threshold).cast(LongType))
  }

  /** Kneser–Ney model (Kneser & Ney 1995; Chen & Goodman 1999 §2.7's
    * interpolated form with a fixed absolute discount D = 3/4): beside
    * the raw counts, KN needs the TYPE statistics — how many distinct
    * bigram types follow a context (N1+(w1,·)), how many distinct
    * contexts precede a word (N1+(·,w2), the "continuation" count that
    * replaces the raw unigram in the backoff), and the total number of
    * bigram types. All counted over the hashed bucket spaces, so every
    * type statistic is bounded by B = 65536 regardless of corpus size
    * and the model stays ≤ 4·B + 1 rows (broadcastable at any scale).
    *
    * Model rows (bucket, kind, cnt): kind 0 = context count c1(ub),
    * 1 = bigram count c12(bb), 2 = N1+(ub,·) distinct-following,
    * 3 = N1+(·,vb) distinct-preceding, 4 = total bigram types (one
    * row, bucket 0). */
  def trainKn(docs: DataFrame, textCol: String, isRef: Column,
      idCol: String = "doc_id"): DataFrame = {
    val p = pairs(docs.filter(isRef), idCol, textCol).filter(col("ub").isNotNull)
    // one pass for the two ub statistics (raw + type count), split into
    // the two model kinds on the already-aggregated ≤B-row frame
    val ubStats = p.groupBy(col("ub").as("bucket"))
      .agg(count(lit(1)).as("c1"), countDistinct(col("bb")).as("n1"))
      .localCheckpoint()
    ubStats.select(col("bucket"), lit(0L).as("kind"), col("c1").as("cnt"))
      .unionAll(
        ubStats.select(col("bucket"), lit(2L).as("kind"), col("n1").as("cnt")))
      .unionAll(
        p.groupBy(col("bb").as("bucket")).agg(count(lit(1)).as("cnt"))
          .select(col("bucket"), lit(1L).as("kind"), col("cnt")))
      .unionAll(
        p.groupBy(col("vb").as("bucket")).agg(countDistinct(col("ub")).as("cnt"))
          .select(col("bucket"), lit(3L).as("kind"), col("cnt")))
      .unionAll(
        p.agg(countDistinct(col("bb")).as("cnt"))
          .select(lit(0L).as("bucket"), lit(4L).as("kind"), col("cnt")))
      .localCheckpoint()
  }

  /** Integer-exact interpolated-KN document score. Per bigram, with
    * D = 3/4 expressed as the rational 3/4 (no floats):
    *
    *   seen context:  q = (S·max(4·c12 − 3, 0)) div (4·c1)
    *                    + (S·3·N1+(ub,·)·N1+(·,vb)) div (4·c1·Nt)
    *   unseen context: q = (S·N1+(·,vb)) div Nt   (pure continuation)
    *
    * (two independent floor divisions — defined, not approximated, the
    * same way in the oracle). BIGINT bounds at 100 TB: type counts are
    * ≤ B = 65536 by construction, so the second numerator is
    * ≤ S·3·B² ≈ 1.3e16 and the denominators ≤ 4·c1·B; the first
    * numerator S·4·c12 needs c12 ≲ 2e12 — satisfied until a single
    * hash bucket holds trillions of bigram occurrences. Document score
    * = sum(q) div n_bigrams, 0 for bigram-less documents. */
  def scoreKnExact(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val ub = model.filter(col("kind").isin(0L, 2L))
      .groupBy(col("bucket").as("ub"))
      .agg(max(when(col("kind") === 0L, col("cnt"))).as("c1"),
        max(when(col("kind") === 2L, col("cnt"))).as("n1"))
    val bi = model.filter(col("kind") === 1L)
      .select(col("bucket").as("bb"), col("cnt").as("c2"))
    val vb = model.filter(col("kind") === 3L)
      .select(col("bucket").as("vb"), col("cnt").as("nc"))
    // Nt (the kind-4 row, total bigram types) divides every
    // continuation term. The model is a bounded artifact (≤ 4·B+1
    // rows), so extract it eagerly and fail with the REAL problem —
    // an empty reference slice — instead of a bare DIVIDE_BY_ZERO
    // surfacing deep inside the scoring plan under ANSI mode.
    val nt = model.filter(col("kind") === 4L).select(col("cnt")).head().getLong(0)
    require(nt > 0,
      "KN model trained on a reference slice with no bigrams (Nt = 0) — " +
        "nothing to estimate continuation probabilities from")
    pairs(docs, idCol, textCol)
      .join(broadcast(ub), Seq("ub"), "left")
      .join(broadcast(bi), Seq("bb"), "left")
      .join(broadcast(vb), Seq("vb"), "left")
      .withColumn("__q", when(col("ub").isNull, lit(0L)).otherwise(
        when(col("c1").isNotNull,
          expr(s"($Scale * greatest(4L * coalesce(c2, 0L) - 3L, 0L)) div (4L * c1)") +
            expr(s"($Scale * 3L * n1 * coalesce(nc, 0L)) div (4L * c1 * $nt)"))
          .otherwise(expr(s"($Scale * coalesce(nc, 0L)) div $nt"))))
      .groupBy(col(idCol), col("n_bigrams"))
      .agg(sum(col("__q")).as("__sq"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") > 0, expr("__sq div n_bigrams"))
          .otherwise(lit(0L)).as("kn_score"))
  }

  // ------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
  // Two hashed bag-of-bigrams models — one over the TARGET domain
  // slice, one over the RAW corpus — and each document is scored by
  // its per-feature importance ratio p_target(f)/p_raw(f). High mean
  // ratio = the document looks like the target domain relative to the
  // crawl at large; DSIR selects pretraining data by resampling with
  // these weights, our gate form thresholds them (the deterministic
  // equivalent at fixed budget).
  //
  // Integer-exact form: the global constant (N_raw+B)/(N_target+B) in
  // the ratio is rank-irrelevant within one corpus and is folded out,
  // so the per-bigram term is q = (S·(ct+1)) div (cr+1) — add-one
  // smoothed counts only, BIGINT-bounded (S·(ct+1) needs ct ≲ 9e12 —
  // a single hash bucket holding trillions of target occurrences).
  // Document weight = mean(q) in floor division; both models are ≤ B
  // rows of bigram counts, so scoring is two broadcast joins over one
  // corpus scan — map-side at 100 TB.
  // ------------------------------------------------------------------

  /** Integer-exact DSIR document weight: per document emit n_bigrams,
    * dsir_score = mean over bigram features of
    * (S·(ct+1)) div (cr+1) (0 when the document has no bigram), and
    * selected = 1 iff dsir_score ≥ threshold. `target` / `raw` are
    * [[train]] models (their kind-1 bigram rows are used). */
  def scoreDsir(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, raw: DataFrame, threshold: Long): DataFrame = {
    val t = target.filter(col("kind") === 1L)
      .select(col("bucket").as("bb"), col("cnt").as("ct"))
    val r = raw.filter(col("kind") === 1L)
      .select(col("bucket").as("bb"), col("cnt").as("cr"))
    pairs(docs, idCol, textCol)
      .join(broadcast(t), Seq("bb"), "left")
      .join(broadcast(r), Seq("bb"), "left")
      .withColumn("__q", when(col("ub").isNull, lit(0L)).otherwise(
        expr(s"($Scale * (coalesce(ct, 0L) + 1L)) div (coalesce(cr, 0L) + 1L)")))
      .groupBy(col(idCol), col("n_bigrams"))
      .agg(sum(col("__q")).as("__sq"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") > 0, expr("__sq div n_bigrams"))
          .otherwise(lit(0L)).as("dsir_score"))
      .withColumn("selected",
        (col("n_bigrams") > 0 && col("dsir_score") >= threshold).cast(LongType))
  }

  // ------------------------------------------------------------------
  // Trigram interpolated Kneser–Ney — the next rung of the KenLM shape
  // (Heafield 2011 trains 5-gram KN models; the recursion below is
  // Chen & Goodman 1999 §2.8's interpolated form cut at order 3, every
  // level discounted by D = 3/4):
  //
  //   p3(w3|w1w2) = max(c123−D,0)/c12 + (D·N1+(w1w2,·)/c12) · p2c(w3|w2)
  //   p2c(w3|w2)  = max(N1+(·w2w3)−D,0)/N1+(·w2·)
  //                 + (D·N1+(w2,·)/N1+(·w2·)) · p1c(w3)
  //   p1c(w3)     = N1+(·w3) / N1+(··)
  //
  // Every statistic is counted over the HASHED bucket spaces of the
  // reference slice's trigram stream (so the model is ≤ 7·B+1 rows at
  // any corpus size), and — for self-consistency and a replayable
  // oracle — the bigram-level type counts are DEFINED over the same
  // trigram stream: N1+(w2,·) = distinct (w2,w3) pair buckets with
  // middle w2, N1+(·w3) = distinct pair buckets ending in w3, N1+(··)
  // = total distinct pair buckets.
  // ------------------------------------------------------------------

  /** md5 bucket of a trigram ("t:" tag keeps the space independent of
    * the unigram/bigram ones). */
  def triBucket(w1: Column, w2: Column, w3: Column): Column =
    Sketches.md5Long56(concat(lit("t:"), w1, lit(" "), w2, lit(" "), w3)) % Buckets

  def triBucketSql(w1Expr: String, w2Expr: String, w3Expr: String): String =
    s"${Sketches.md5Long56Sql(s"'t:' || $w1Expr || ' ' || $w2Expr || ' ' || $w3Expr")} % $Buckets"

  /** Adjacent-triple explode of `textCol` with every bucket the KN3
    * recursion needs attached: u1 (first word), cb (context pair
    * w1w2), tb (trigram), ab (continuation pair w2w3), mb (middle
    * word w2), wb (last word w3). Documents with fewer than 3 tokens
    * keep one all-null row (explode_outer) so they survive scoring. */
  private def triples(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol),
        greatest(size(col("__ws")) - 2, lit(0)).cast(LongType).as("n_trigrams"),
        explode_outer(when(size(col("__ws")) >= 3,
          expr("transform(sequence(0, size(__ws) - 3), " +
            "i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2, __ws[i + 2] AS w3))"))).as("__t"))
      .select(col(idCol), col("n_trigrams"),
        uniBucket(col("__t.w1")).as("u1"),
        biBucket(col("__t.w1"), col("__t.w2")).as("cb"),
        triBucket(col("__t.w1"), col("__t.w2"), col("__t.w3")).as("tb"),
        biBucket(col("__t.w2"), col("__t.w3")).as("ab"),
        uniBucket(col("__t.w2")).as("mb"),
        uniBucket(col("__t.w3")).as("wb"))

  /** Trigram-KN model: (bucket, kind, cnt), ≤ 7·B + 1 rows. Kinds:
    * 0 = c12 context count (by cb), 1 = c123 trigram count (by tb),
    * 2 = N1+(w1w2,·) types following a context (by cb), 3 = N1+(·w2w3)
    * distinct predecessors of a pair (by ab), 4 = N1+(·w2·) trigram
    * types with middle w2 (by mb), 5 = N1+(w2,·) pair types with
    * middle w2 (by mb), 6 = N1+(·w3) pair types ending in w3 (by wb),
    * 7 = N1+(··) total pair types (one row). Key-space-sharing stats
    * (0+2, 4+5) aggregate in one pass each. */
  def trainKn3(docs: DataFrame, textCol: String, isRef: Column,
      idCol: String = "doc_id"): DataFrame = {
    val p = triples(docs.filter(isRef), idCol, textCol).filter(col("u1").isNotNull)
    val cbStats = p.groupBy(col("cb").as("bucket"))
      .agg(count(lit(1)).as("c12"), countDistinct(col("tb")).as("n2"))
      .localCheckpoint()
    val mbStats = p.groupBy(col("mb").as("bucket"))
      .agg(countDistinct(col("tb")).as("nm"), countDistinct(col("ab")).as("nf"))
      .localCheckpoint()
    cbStats.select(col("bucket"), lit(0L).as("kind"), col("c12").as("cnt"))
      .unionAll(cbStats.select(col("bucket"), lit(2L).as("kind"), col("n2").as("cnt")))
      .unionAll(p.groupBy(col("tb").as("bucket")).agg(count(lit(1)).as("cnt"))
        .select(col("bucket"), lit(1L).as("kind"), col("cnt")))
      .unionAll(p.groupBy(col("ab").as("bucket")).agg(countDistinct(col("u1")).as("cnt"))
        .select(col("bucket"), lit(3L).as("kind"), col("cnt")))
      .unionAll(mbStats.select(col("bucket"), lit(4L).as("kind"), col("nm").as("cnt")))
      .unionAll(mbStats.select(col("bucket"), lit(5L).as("kind"), col("nf").as("cnt")))
      .unionAll(p.groupBy(col("wb").as("bucket")).agg(countDistinct(col("ab")).as("cnt"))
        .select(col("bucket"), lit(6L).as("kind"), col("cnt")))
      .unionAll(p.agg(countDistinct(col("ab")).as("cnt"))
        .select(lit(0L).as("bucket"), lit(7L).as("kind"), col("cnt")))
      .localCheckpoint()
  }

  /** Integer-exact interpolated trigram-KN document score: per
    * trigram, with D = 3/4 as the rational 3/4,
    *
    *   seen context (c12 and the middle stats present):
    *     q = (S·max(4·c123−3,0)) div (4·c12)
    *       + (S·3·N2·max(4·nA−3,0)) div (16·c12·nM)
    *       + (((S·9·N2·nF) div (16·c12·nM)) · nU) div nT
    *   seen context, middle bucket empty (cross-space hash-collision
    *     artifact — cb hit but w2 never a middle): first term only
    *   unseen context, middle seen:
    *     q = (S·max(4·nA−3,0)) div (4·nM) + (S·3·nF·nU) div (4·nM·nT)
    *   both unseen: q = (S·nU) div nT
    *
    * BIGINT bounds at 100 TB: type counts ≤ B = 65536 by construction;
    * term-2's numerator ≤ S·3·B·4·B ≈ 5.2e16; term-3 is factored —
    * N2 ≤ c12 and nF ≤ nM (each pair type arises from ≥1 trigram
    * type), so the inner division is ≤ 9·S/16 ≈ 5.6e5 and the outer
    * product ≤ 3.7e10 — because the unfactored numerator S·9·N2·nF·nU
    * could reach 2.5e21 at bucket saturation. Same factoring in the
    * oracle, term for term. Document score = sum(q) div n_trigrams,
    * 0 for trigram-less documents. */
  def scoreKn3Exact(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val cbm = model.filter(col("kind").isin(0L, 2L))
      .groupBy(col("bucket").as("cb"))
      .agg(max(when(col("kind") === 0L, col("cnt"))).as("c12"),
        max(when(col("kind") === 2L, col("cnt"))).as("n2"))
    val tbm = model.filter(col("kind") === 1L)
      .select(col("bucket").as("tb"), col("cnt").as("na3"))
    val abm = model.filter(col("kind") === 3L)
      .select(col("bucket").as("ab"), col("cnt").as("na"))
    val mbm = model.filter(col("kind").isin(4L, 5L))
      .groupBy(col("bucket").as("mb"))
      .agg(max(when(col("kind") === 4L, col("cnt"))).as("nm"),
        max(when(col("kind") === 5L, col("cnt"))).as("nf"))
    val wbm = model.filter(col("kind") === 6L)
      .select(col("bucket").as("wb"), col("cnt").as("nu"))
    // nT divides every continuation term; extract it eagerly from the
    // bounded model and fail with the real problem (empty reference
    // slice) instead of a bare DIVIDE_BY_ZERO — the scoreKnExact guard
    val nt = model.filter(col("kind") === 7L).select(col("cnt")).head().getLong(0)
    require(nt > 0,
      "trigram KN model trained on a reference slice with no trigrams (Nt = 0)")
    triples(docs, idCol, textCol)
      .join(broadcast(cbm), Seq("cb"), "left")
      .join(broadcast(tbm), Seq("tb"), "left")
      .join(broadcast(abm), Seq("ab"), "left")
      .join(broadcast(mbm), Seq("mb"), "left")
      .join(broadcast(wbm), Seq("wb"), "left")
      .withColumn("__q", when(col("u1").isNull, lit(0L)).otherwise(
        when(col("c12").isNotNull && col("nm").isNotNull,
          expr(s"($Scale * greatest(4L * coalesce(na3, 0L) - 3L, 0L)) div (4L * c12)") +
            expr(s"($Scale * 3L * n2 * greatest(4L * coalesce(na, 0L) - 3L, 0L)) div (16L * c12 * nm)") +
            expr(s"((($Scale * 9L * n2 * coalesce(nf, 0L)) div (16L * c12 * nm)) * coalesce(nu, 0L)) div $nt"))
          .when(col("c12").isNotNull,
            expr(s"($Scale * greatest(4L * coalesce(na3, 0L) - 3L, 0L)) div (4L * c12)"))
          .when(col("nm").isNotNull,
            expr(s"($Scale * greatest(4L * coalesce(na, 0L) - 3L, 0L)) div (4L * nm)") +
              expr(s"($Scale * 3L * coalesce(nf, 0L) * coalesce(nu, 0L)) div (4L * nm * $nt)"))
          .otherwise(expr(s"($Scale * coalesce(nu, 0L)) div $nt"))))
      .groupBy(col(idCol), col("n_trigrams"))
      .agg(sum(col("__q")).as("__sq"))
      .select(col(idCol), col("n_trigrams"),
        when(col("n_trigrams") > 0, expr("__sq div n_trigrams"))
          .otherwise(lit(0L)).as("kn3_score"))
  }

  /** Production ranking twin: mean negative log-likelihood per bigram
    * (log-perplexity; lower = more reference-like). Float math — fast
    * and rankable, NOT bit-reproducible across engines; the gate uses
    * [[scoreExact]]. */
  def scoreLogPpl(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val uni = model.filter(col("kind") === 0L).select(col("bucket").as("ub"), col("cnt").as("c1"))
    val bi = model.filter(col("kind") === 1L).select(col("bucket").as("bb"), col("cnt").as("c2"))
    pairs(docs, idCol, textCol)
      .join(broadcast(uni), Seq("ub"), "left")
      .join(broadcast(bi), Seq("bb"), "left")
      .withColumn("__nll", when(col("ub").isNull, lit(null)).otherwise(
        -log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + Buckets).cast("double"))))
      .groupBy(col(idCol))
      .agg(avg(col("__nll")).as("log_ppl"))
  }
}

/** Bigram-LM gate. q_lm1: train on the doc_id % 11 == 0 slice (the
  * qc1/dc1 reference-corpus convention), score every background doc;
  * threshold 57 = the corpus's score midpoint at gate scale (scores
  * span 40–75 at sf0.01), a fixed parameter like dd6's 7/20 —
  * production derives head/middle/tail cuts from sampled quantiles
  * (q_sp4) instead of a constant. */
object NgramLmQueries extends QueryModule {
  import NgramLm._

  private val RefLikeThreshold = 57L

  // Persisted model artifact (the Bpe.writeMerges discipline, via the
  // shared graft.core.TrainOnce disk tier): the LM gates share the
  // identical reference-slice model per (variant, sf dir) — trained
  // once, written as a parquet artifact keyed by the source dir's
  // content fingerprint, and READ by every later process (bench fork
  // JVMs, production scoring runs). The collected model is ≤ 4·65536+1
  // rows of three longs (a few MB) and re-enters every query plan as a
  // fresh local DataFrame (broadcast-joined as before). The
  // fingerprint key means an in-place regeneration of the dataset
  // retrains instead of serving a stale model.
  private val modelSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bucket", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("kind", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false)))

  private def lmModelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"ngramlm:lm:$d", d, modelSchema)(
      train(Tables.documents(s, d), "text", col("doc_id") % 11 === 0))

  private def knModelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"ngramlm:kn:$d", d, modelSchema)(
      trainKn(Tables.documents(s, d), "text", col("doc_id") % 11 === 0))

  /** Tokenize → bigram-pair explode: the CTE prefix every LM oracle
    * (add-one and Kneser–Ney) builds on. */
  private[operators] def pairsSqlCtes: String =
    """toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        FROM documents),
      prs AS MATERIALIZED (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM toks WHERE len(ws) >= 2))"""

  /** Shared oracle prefix: tokenize → bigram-pair explode → hashed
    * model counts → per-background-doc likelihood sums. */
  private def lmSqlCtes: String = {
    val ub = uniBucketSql("w1")
    val bb = biBucketSql("w1", "w2")
    s"""$pairsSqlCtes,
      refp AS MATERIALIZED (
        SELECT $ub AS ub, $bb AS bb FROM prs WHERE doc_id % 11 = 0),
      uni AS (SELECT ub, count(*) AS c1 FROM refp GROUP BY ub),
      bi AS (SELECT bb, count(*) AS c2 FROM refp GROUP BY bb),
      bgp AS (
        SELECT doc_id, $ub AS ub, $bb AS bb FROM prs WHERE doc_id % 11 <> 0),
      sums AS (
        SELECT p.doc_id,
               CAST(sum(($Scale * (coalesce(b.c2, 0) + 1)) // (coalesce(u.c1, 0) + $Buckets)) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_bg
        FROM bgp p
        LEFT JOIN uni u ON u.ub = p.ub
        LEFT JOIN bi b ON b.bb = p.bb
        GROUP BY p.doc_id)"""
  }

  private val lm1 = Q(
    "q_lm1_bigram_lm_score",
    "hashed bigram-LM perplexity filter: reference-trained smoothed LM, integer-exact mean likelihood",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = lmModelOf(s, d)
      scoreExact(docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text",
        model, RefLikeThreshold)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $lmSqlCtes
      SELECT t.doc_id,
             CAST(greatest(len(t.ws) - 1, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS lm_score,
             CAST(CASE WHEN s.n_bg > 0 AND s.sq // s.n_bg >= $RefLikeThreshold
               THEN 1 ELSE 0 END AS BIGINT) AS ref_like
      FROM toks t
      LEFT JOIN sums s ON s.doc_id = t.doc_id
      WHERE t.doc_id % 11 <> 0
      ORDER BY t.doc_id"""))

  /** Token budget for q_lm2 — the background slice holds ~24.6k tokens
    * at sf0.01, so 10k admits the best ~40%. */
  private val TokenBudget = 10000L

  private val lm2 = Q(
    "q_lm2_budget_select",
    s"token-budget corpus selection: LM-quality-ranked fill-until-full at $TokenBudget tokens",
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val model = lmModelOf(s, d)
      val bg = docs.filter(col("doc_id") % 11 =!= 0)
      val scored = scoreExact(bg, "doc_id", "text", model, RefLikeThreshold)
        .select(col("doc_id"), col("lm_score"))
      val toks = bg.select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      BudgetSelect.select(scored.join(toks, Seq("doc_id")),
          "doc_id", "lm_score", "n_tokens", TokenBudget)
        .select(col("doc_id"), col("lm_score"), col("n_tokens"),
          col("cum_before"), col("selected"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $lmSqlCtes,
      scored AS (
        SELECT t.doc_id,
               CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS lm_score,
               CAST(len(t.ws) AS BIGINT) AS n_tokens
        FROM toks t
        LEFT JOIN sums s ON s.doc_id = t.doc_id
        WHERE t.doc_id % 11 <> 0),
      sel AS (
        SELECT doc_id, lm_score, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY lm_score DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM scored)
      SELECT doc_id, lm_score, n_tokens, cum_before,
             CAST(CASE WHEN cum_before < $TokenBudget THEN 1 ELSE 0 END AS BIGINT) AS selected
      FROM sel ORDER BY doc_id"""))

  /** q_lm3's sample rate: the tercile cuts come from this md5-gated
    * slice of the scored corpus — the sp4 move; at production scale
    * the rate is chosen so the sample (not the corpus) bounds the
    * quantile work. */
  private val CutSampleRate = 0.5

  private val lm3 = Q(
    "q_lm3_ppl_buckets",
    "CCNet head/middle/tail bucketing: tercile cuts from a deterministic score sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = lmModelOf(s, d)
      // scored feeds BOTH the sample→cuts path and the final bucketing;
      // ranked feeds its own count and the cut aggregate. These frames
      // are O(corpus), so they persist DISK_ONLY — NOT localCheckpoint:
      // a checkpoint pins corpus-sized blocks with truncated lineage
      // (an executor loss mid-run kills the job instead of recomputing)
      // and its RDD blocks survive catalog.clearCache(). DISK_ONLY
      // keeps lineage (loss → recompute; the chain is deterministic
      // integer math) and is dropped by clearCache()/unpersist. Gate
      // callers rely on the bench's per-query clearCache; job callers
      // own an explicit unpersist.
      val scored = scoreExact(docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text",
          model, RefLikeThreshold)
        .select(col("doc_id"), col("lm_score"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      // global score rank over the sample via the banded two-level rank
      // (LengthBatching with batchSize 1: batch_id IS the 0-based rank)
      val ranked = LengthBatching.batches(
          Sampling.deterministicSample(scored, "doc_id", CutSampleRate),
          "doc_id", "lm_score", batchSize = 1)
        .select(col("lm_score"), col("batch_id").as("rk"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val cuts = ranked
        .crossJoin(broadcast(ranked.agg(count(lit(1)).as("__n"))))
        .agg(min(when((col("rk") + 1) * 3 >= col("__n"), col("lm_score"))).as("t1"),
          min(when((col("rk") + 1) * 3 >= col("__n") * 2, col("lm_score"))).as("t2"))
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("lm_score"),
          when(col("lm_score") >= col("t2"), lit("head"))
            .when(col("lm_score") >= col("t1"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $lmSqlCtes,
      scored AS (
        SELECT t.doc_id, CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS lm_score
        FROM toks t
        LEFT JOIN sums s ON s.doc_id = t.doc_id
        WHERE t.doc_id % 11 <> 0),
      samp AS (
        SELECT * FROM scored
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(CutSampleRate)}'),
      r AS (
        SELECT lm_score,
               row_number() OVER (ORDER BY lm_score ASC, doc_id ASC) AS rn,
               count(*) OVER () AS n
        FROM samp),
      cuts AS (
        SELECT CAST(min(CASE WHEN rn * 3 >= n THEN lm_score END) AS BIGINT) AS t1,
               CAST(min(CASE WHEN rn * 3 >= 2 * n THEN lm_score END) AS BIGINT) AS t2
        FROM r)
      SELECT s.doc_id, s.lm_score,
             CASE WHEN s.lm_score >= c.t2 THEN 'head'
                  WHEN s.lm_score >= c.t1 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s CROSS JOIN cuts c
      ORDER BY s.doc_id"""))

  /** KN oracle CTEs: the pair prefix plus the four type-statistic
    * aggregates and the per-bigram interpolated score (D = 3/4 as the
    * rational 3/4; the two floor divisions mirror
    * [[NgramLm.scoreKnExact]] term for term). */
  private def knSqlCtes: String = {
    val ub = uniBucketSql("w1")
    val vb = uniBucketSql("w2")
    val bb = biBucketSql("w1", "w2")
    s"""$pairsSqlCtes,
      krefp AS MATERIALIZED (
        SELECT $ub AS ub, $vb AS vb, $bb AS bb FROM prs WHERE doc_id % 11 = 0),
      kc1 AS (SELECT ub, count(*) AS c1, count(DISTINCT bb) AS n1 FROM krefp GROUP BY ub),
      kcb AS (SELECT bb, count(*) AS c2 FROM krefp GROUP BY bb),
      knc AS (SELECT vb, count(DISTINCT ub) AS nc FROM krefp GROUP BY vb),
      knt AS (SELECT count(DISTINCT bb) AS nt FROM krefp),
      kbgp AS (
        SELECT doc_id, $ub AS ub, $vb AS vb, $bb AS bb
        FROM prs WHERE doc_id % 11 <> 0),
      kq AS (
        -- knt.nt = 0 (reference slice with no bigrams) errors here as a
        -- division by zero; the Spark side rejects the same condition
        -- up front with a named require in scoreKnExact
        SELECT p.doc_id,
               CASE WHEN u.c1 IS NOT NULL THEN
                 ($Scale * greatest(4 * coalesce(b.c2, 0) - 3, 0)) // (4 * u.c1)
                 + ($Scale * 3 * u.n1 * coalesce(n.nc, 0)) // (4 * u.c1 * t.nt)
               ELSE ($Scale * coalesce(n.nc, 0)) // t.nt END AS q
        FROM kbgp p
        LEFT JOIN kc1 u ON u.ub = p.ub
        LEFT JOIN kcb b ON b.bb = p.bb
        LEFT JOIN knc n ON n.vb = p.vb
        CROSS JOIN knt t),
      ksums AS (
        SELECT doc_id, CAST(sum(q) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_bg
        FROM kq GROUP BY doc_id)"""
  }

  private val lm4 = Q(
    "q_lm4_kneser_ney",
    "interpolated Kneser-Ney bigram LM: absolute discount 3/4, hashed continuation counts, integer-exact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = knModelOf(s, d)
      scoreKnExact(docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text", model)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $knSqlCtes
      SELECT t.doc_id,
             CAST(greatest(len(t.ws) - 1, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS kn_score
      FROM toks t
      LEFT JOIN ksums s ON s.doc_id = t.doc_id
      WHERE t.doc_id % 11 <> 0
      ORDER BY t.doc_id"""))

  /** q_lm5's corpus-wide token budget to allocate across domains. */
  private val MixBudget = 20000L

  // Quality-weighted domain mixing — the step between scoring and
  // sampling when a training mix is DESIGNED rather than taken as-is
  // (the data-mixture question of DoReMi (Xie et al. 2023) / the
  // Llama-style mix tables, answered with the deterministic
  // quality-proportional rule): each source domain gets budget share
  // ∝ (mean LM score × its token mass), so high-quality domains are
  // upweighted but cannot allocate beyond their actual size times
  // quality. Everything is integer: per-domain aggregates (one
  // groupBy), one broadcast total, floor-divided allocations. BIGINT
  // bound: the allocation numerator is Budget·weight =
  // Budget·mean_score·mass ≤ 2e4·10^6·mass, which stays inside 2^63
  // only while a single domain holds ≲ 4.6e8 tokens — beyond that,
  // pre-scale the weights (divide every __w by a common 10^k before
  // the multiply; allocations shift by at most the rounding of the
  // dropped digits) or compute the shares in the float twin. Left
  // unscaled in the gate to keep both engines' arithmetic identical
  // (under ANSI Spark an overflow fails loudly, never silently). The
  // domain table is O(#sources) — tiny at any corpus scale; the only
  // corpus-sized work is the lm scoring scan the other lm gates
  // already pin.
  private val lm5 = Q(
    "q_lm5_domain_mix",
    s"quality-weighted domain mixing: token budget $MixBudget split ∝ mean-LM-score × token mass",
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val bg = docs.filter(col("doc_id") % 11 =!= 0)
      val scored = scoreExact(bg, "doc_id", "text", lmModelOf(s, d), RefLikeThreshold)
        .select(col("doc_id"), col("lm_score"))
      val toks = bg.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      val domains = toks.join(scored, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("lm_score")).as("__s"))
        .withColumn("mean_score", expr("__s div n_docs"))
        .withColumn("__w", col("mean_score") * col("n_tokens"))
        // two consumers (allocation rows + the broadcast total): the
        // O(#sources) frame checkpoints so the corpus scoring chain
        // beneath it runs once, not per consumer (the lm3 discipline)
        .localCheckpoint()
      domains
        .crossJoin(broadcast(domains.agg(sum(col("__w")).as("__tw"))))
        // degenerate corpus (every domain's floor-divided mean score 0
        // → total weight 0): allocate 0 everywhere instead of erroring
        // with a bare division-by-zero — mirrored in the oracle's CASE
        .withColumn("alloc_tokens",
          when(col("__tw") > 0, expr(s"($MixBudget * __w) div __tw"))
            .otherwise(lit(0L)))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("mean_score"), col("alloc_tokens"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH $lmSqlCtes,
      scored AS (
        SELECT t.doc_id, CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS lm_score,
               CAST(len(t.ws) AS BIGINT) AS n_tokens
        FROM toks t
        LEFT JOIN sums s ON s.doc_id = t.doc_id
        WHERE t.doc_id % 11 <> 0),
      domains AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(sc.n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(sc.lm_score) AS BIGINT) AS s_sum
        FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
        GROUP BY d.source),
      dw AS (
        SELECT source, n_docs, n_tokens,
               s_sum // n_docs AS mean_score,
               (s_sum // n_docs) * n_tokens AS w
        FROM domains),
      tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM dw)
      SELECT source, n_docs, n_tokens,
             CAST(mean_score AS BIGINT) AS mean_score,
             CAST(CASE WHEN t.tw > 0 THEN ($MixBudget * w) // t.tw ELSE 0 END AS BIGINT) AS alloc_tokens
      FROM dw CROSS JOIN tw t
      ORDER BY source"""))

  private def kn3ModelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"ngramlm:kn3:$d", d, modelSchema)(
      trainKn3(Tables.documents(s, d), "text", col("doc_id") % 11 === 0))

  /** Trigram-KN oracle CTEs: triple explode → the seven hashed type
    * statistics → the per-trigram interpolated score, mirroring
    * [[NgramLm.scoreKn3Exact]] term for term (including the factored
    * third term — see the BIGINT-bound note there). */
  private def kn3SqlCtes: String = {
    val u1 = uniBucketSql("w1")
    val cb = biBucketSql("w1", "w2")
    val tb = triBucketSql("w1", "w2", "w3")
    val ab = biBucketSql("w2", "w3")
    val mb = uniBucketSql("w2")
    val wb = uniBucketSql("w3")
    s"""toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        FROM documents),
      trs AS MATERIALIZED (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
              FROM toks WHERE len(ws) >= 3)),
      tref AS MATERIALIZED (
        SELECT $u1 AS u1, $cb AS cb, $tb AS tb, $ab AS ab, $mb AS mb, $wb AS wb
        FROM trs WHERE doc_id % 11 = 0),
      tcb AS (SELECT cb, count(*) AS c12, count(DISTINCT tb) AS n2 FROM tref GROUP BY cb),
      ttb AS (SELECT tb, count(*) AS c123 FROM tref GROUP BY tb),
      tab AS (SELECT ab, count(DISTINCT u1) AS na FROM tref GROUP BY ab),
      tmb AS (SELECT mb, count(DISTINCT tb) AS nm, count(DISTINCT ab) AS nf FROM tref GROUP BY mb),
      twb AS (SELECT wb, count(DISTINCT ab) AS nu FROM tref GROUP BY wb),
      tnt AS (SELECT count(DISTINCT ab) AS nt FROM tref),
      tbg AS (
        SELECT doc_id, $cb AS cb, $tb AS tb, $ab AS ab, $mb AS mb, $wb AS wb
        FROM trs WHERE doc_id % 11 <> 0),
      tq AS (
        -- t.nt = 0 (reference slice with no trigrams) errors here as a
        -- division by zero; the Spark side rejects it up front with a
        -- named require in scoreKn3Exact
        SELECT p.doc_id,
               CASE
                 WHEN c.c12 IS NOT NULL AND m.nm IS NOT NULL THEN
                   ($Scale * greatest(4 * coalesce(g.c123, 0) - 3, 0)) // (4 * c.c12)
                   + ($Scale * 3 * c.n2 * greatest(4 * coalesce(a.na, 0) - 3, 0)) // (16 * c.c12 * m.nm)
                   + ((($Scale * 9 * c.n2 * coalesce(m.nf, 0)) // (16 * c.c12 * m.nm)) * coalesce(u.nu, 0)) // t.nt
                 WHEN c.c12 IS NOT NULL THEN
                   ($Scale * greatest(4 * coalesce(g.c123, 0) - 3, 0)) // (4 * c.c12)
                 WHEN m.nm IS NOT NULL THEN
                   ($Scale * greatest(4 * coalesce(a.na, 0) - 3, 0)) // (4 * m.nm)
                   + ($Scale * 3 * coalesce(m.nf, 0) * coalesce(u.nu, 0)) // (4 * m.nm * t.nt)
                 ELSE ($Scale * coalesce(u.nu, 0)) // t.nt
               END AS q
        FROM tbg p
        LEFT JOIN tcb c ON c.cb = p.cb
        LEFT JOIN ttb g ON g.tb = p.tb
        LEFT JOIN tab a ON a.ab = p.ab
        LEFT JOIN tmb m ON m.mb = p.mb
        LEFT JOIN twb u ON u.wb = p.wb
        CROSS JOIN tnt t),
      tsums AS (
        SELECT doc_id, CAST(sum(q) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_tg
        FROM tq GROUP BY doc_id)"""
  }

  private val lm6 = Q(
    "q_lm6_trigram_kneser_ney",
    "interpolated trigram Kneser-Ney: 3-level discount recursion over hashed type counts, integer-exact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = kn3ModelOf(s, d)
      scoreKn3Exact(docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text", model)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $kn3SqlCtes
      SELECT t.doc_id,
             CAST(greatest(len(t.ws) - 2, 0) AS BIGINT) AS n_trigrams,
             CAST(coalesce(s.sq // s.n_tg, 0) AS BIGINT) AS kn3_score
      FROM toks t
      LEFT JOIN tsums s ON s.doc_id = t.doc_id
      WHERE t.doc_id % 11 <> 0
      ORDER BY t.doc_id"""))

  /** q_lm7's selection threshold (score scale = [[NgramLm.Scale]]):
    * picked from the sf0.01 score distribution so the DSIR gate admits
    * most of the target slice plus the target-like tail of the rest —
    * at sf0.01, 193/218 'en' docs and ~32 others. Production callers
    * set it from their token budget instead (sort by weight, cut). */
  val DsirThreshold = 455000L

  // DSIR models via the same disk-artifact tier as the LM models:
  // target = the 'en' slice (the "formal text" domain proxy of Xie et
  // al.'s Pile-CC setup), raw = the whole corpus. Both ≤ 2·B rows.
  def dsirTargetModelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"ngramlm:dsir_t:$d", d, modelSchema)(
      train(Tables.documents(s, d), "text", col("lang") === "en"))

  def dsirRawModelOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(s, s"ngramlm:dsir_r:$d", d, modelSchema)(
      train(Tables.documents(s, d), "text", lit(true)))

  private val lm7 = Q(
    "q_lm7_dsir",
    "DSIR importance weighting: hashed-bigram target/raw likelihood ratio, integer-exact, thresholded selection",
    (s, d) => {
      val docs = Tables.documents(s, d)
      scoreDsir(docs, "doc_id", "text",
          dsirTargetModelOf(s, d), dsirRawModelOf(s, d), DsirThreshold)
        .orderBy(col("doc_id"))
    },
    Some {
      val bb = biBucketSql("w1", "w2")
      s"""
      WITH $pairsSqlCtes,
      allb AS MATERIALIZED (SELECT doc_id, $bb AS bb FROM prs),
      tcnt AS (
        SELECT bb, count(*) AS ct FROM allb
        WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        GROUP BY bb),
      rcnt AS (SELECT bb, count(*) AS cr FROM allb GROUP BY bb),
      sums AS (
        SELECT a.doc_id,
               CAST(sum(($Scale * (coalesce(t.ct, 0) + 1)) // (coalesce(r.cr, 0) + 1)) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_bg
        FROM allb a
        LEFT JOIN tcnt t ON t.bb = a.bb
        LEFT JOIN rcnt r ON r.bb = a.bb
        GROUP BY a.doc_id)
      SELECT t.doc_id,
             CAST(greatest(len(t.ws) - 1, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(s.sq // s.n_bg, 0) AS BIGINT) AS dsir_score,
             CAST(CASE WHEN s.n_bg > 0 AND s.sq // s.n_bg >= $DsirThreshold
               THEN 1 ELSE 0 END AS BIGINT) AS selected
      FROM toks t
      LEFT JOIN sums s ON s.doc_id = t.doc_id
      ORDER BY t.doc_id"""
    })

  // Filter-vs-label audit — the agreement report every cheap selector
  // ships with: how well does the DSIR importance filter (q_lm7's
  // exact selection) recover the target-domain label it was tuned
  // toward? Confusion cells + integer parts-per-million metrics
  // (floor division, zero-guarded — no float ratios in the gate).
  // This is deliberately an IN-SAMPLE audit (the filter is a corpus
  // statistic, not a holdout model): it measures selector/label
  // agreement, the number a pipeline dashboards before trusting the
  // cheap filter as a proxy. (A holdout confusion for the qc1-style
  // arithmetic-mean NB was tried and is structurally degenerate: with
  // B-bucket Laplace smoothing flooding the totals, the mean-likelihood
  // comparison collapses to raw count mass — only the log/product form
  // separates, and logs are not gate-exact.)
  private val lm8 = Q(
    "q_lm8_dsir_audit",
    "DSIR filter-vs-label confusion matrix + ppm precision/recall/accuracy",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pred = scoreDsir(docs, "doc_id", "text",
          dsirTargetModelOf(s, d), dsirRawModelOf(s, d), DsirThreshold)
        .select(col("doc_id"), col("selected"))
      val truth = docs.select(col("doc_id"),
        (col("lang") === "en").cast(LongType).as("is_en"))
      pred.join(truth, Seq("doc_id"))
        .agg(
          sum(when(col("selected") === 1L && col("is_en") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("selected") === 1L && col("is_en") === 0L, 1L).otherwise(0L)).as("fp"),
          sum(when(col("selected") === 0L && col("is_en") === 1L, 1L).otherwise(0L)).as("fn"),
          sum(when(col("selected") === 0L && col("is_en") === 0L, 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("(1000000 * tp) div greatest(tp + fp, 1)").as("precision_ppm"),
          expr("(1000000 * tp) div greatest(tp + fn, 1)").as("recall_ppm"),
          expr("(1000000 * (tp + tn)) div greatest(tp + fp + fn + tn, 1)").as("accuracy_ppm"))
    },
    Some {
      val bb = biBucketSql("w1", "w2")
      s"""
      WITH $pairsSqlCtes,
      allb AS MATERIALIZED (SELECT doc_id, $bb AS bb FROM prs),
      tcnt AS (
        SELECT bb, count(*) AS ct FROM allb
        WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        GROUP BY bb),
      rcnt AS (SELECT bb, count(*) AS cr FROM allb GROUP BY bb),
      sums AS (
        SELECT a.doc_id,
               CAST(sum(($Scale * (coalesce(t.ct, 0) + 1)) // (coalesce(r.cr, 0) + 1)) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_bg
        FROM allb a
        LEFT JOIN tcnt t ON t.bb = a.bb
        LEFT JOIN rcnt r ON r.bb = a.bb
        GROUP BY a.doc_id),
      pred AS (
        SELECT t.doc_id,
               CASE WHEN s.n_bg > 0 AND s.sq // s.n_bg >= $DsirThreshold
                 THEN 1 ELSE 0 END AS selected
        FROM toks t LEFT JOIN sums s ON s.doc_id = t.doc_id),
      lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
              FROM documents),
      cm AS (
        SELECT
          CAST(sum(CASE WHEN p.selected = 1 AND l.is_en = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(sum(CASE WHEN p.selected = 1 AND l.is_en = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(sum(CASE WHEN p.selected = 0 AND l.is_en = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(sum(CASE WHEN p.selected = 0 AND l.is_en = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM pred p JOIN lab l USING (doc_id))
      SELECT tp, fp, fn, tn,
             (1000000 * tp) // greatest(tp + fp, 1) AS precision_ppm,
             (1000000 * tp) // greatest(tp + fn, 1) AS recall_ppm,
             (1000000 * (tp + tn)) // greatest(tp + fp + fn + tn, 1) AS accuracy_ppm
      FROM cm"""
    })

  // Domain distance — the mix-design diagnostic beside lm5's quality
  // weighting: per source, the total-variation distance between its
  // hashed-unigram distribution and the corpus's,
  // TV = Σ_b |c_s(b)·N − c(b)·N_s| / (2·N_s·N), in integer ppm.
  // Scale shape: both count tables are hash-bounded (≤ B rows; in
  // practice ≤ |vocab buckets|), the per-source grid is
  // #sources × #buckets — INDEPENDENT of corpus size — and every join
  // broadcasts a bounded frame. BIGINT bound: the summed numerator is
  // ≤ 2·N_s·N, so ×10^6 needs N_s·N ≲ 4.6e12 — beyond that the
  // production form divides per bucket in doubles before summing
  // (ranking-stable; only the gate needs bit-exactness).
  private val lm9 = Q(
    "q_lm9_domain_distance",
    "per-source domain distance: hashed-unigram total variation vs the corpus (ppm)",
    (s, d) => {
      val occ = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .select(col("source"), uniBucket(col("w")).as("b"))
      val sb = occ.groupBy(col("source"), col("b")).agg(count(lit(1)).as("cs"))
      val cb = occ.groupBy(col("b")).agg(count(lit(1)).as("c"))
      val st = sb.groupBy(col("source")).agg(sum(col("cs")).as("ns"))
      val nn = cb.agg(sum(col("c")).as("n"))
      st.crossJoin(broadcast(cb))
        .join(sb, Seq("source", "b"), "left")
        .crossJoin(broadcast(nn))
        .withColumn("__t",
          abs(coalesce(col("cs"), lit(0L)) * col("n") - col("c") * col("ns")))
        .groupBy(col("source"), col("ns"), col("n"))
        .agg(sum(col("__t")).as("__num"))
        .select(col("source"), col("ns").as("n_tokens"),
          expr("(1000000 * __num) div (2 * ns * n)").as("tv_ppm"))
        .orderBy(col("source"))
    },
    Some {
      val ub = uniBucketSql("w")
      s"""
      WITH occ AS (
        SELECT source, $ub AS b FROM (
          SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
          FROM documents)),
      sb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cs FROM occ GROUP BY source, b),
      cb AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY b),
      st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM sb GROUP BY source),
      nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cb),
      grid AS (
        SELECT st.source, st.ns, cb.b, cb.c, coalesce(s2.cs, 0) AS cs, nn.n
        FROM st CROSS JOIN cb CROSS JOIN nn
        LEFT JOIN sb s2 ON s2.source = st.source AND s2.b = cb.b)
      SELECT source, ns AS n_tokens,
             (1000000 * CAST(sum(abs(cs * n - c * ns)) AS BIGINT)) // (2 * ns * n) AS tv_ppm
      FROM grid GROUP BY source, ns, n ORDER BY source"""
    })

  override val all: Seq[Q] = Seq(lm1, lm2, lm3, lm4, lm5, lm6, lm7, lm8, lm9)
}
