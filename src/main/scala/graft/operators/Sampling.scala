package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing — the data-mixing half of
  * a training pipeline ("sample source A at 50%, keep all of B"). No
  * rand(): a row is kept iff the top 32 bits of md5(id) fall under the
  * rate's threshold, compared as fixed-width lowercase hex strings
  * (lexicographic == numeric for fixed-width hex). That makes samples
  * reproducible across runs, partitionings, and engines (the DuckDB
  * oracle does the same string compare), and consistent across
  * overlapping corpora — the same id always decides the same way, so
  * resampling a grown corpus keeps the previously selected rows (the
  * property incremental pipelines need).
  */
object Sampling {

  /** First 8 hex digits of md5(id) — the row's sampling key. */
  def hashGate(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** Hex threshold for a rate in [0,1]; rates ≥ 1 map to "g", which is
    * lexicographically above every hex digit → keep-all without a
    * special case. */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "00000000"
    else f"${(rate * 4294967296.0).toLong}%08x"

  /** Uniform deterministic sample at `rate`. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashGate(col(idCol)) < lit(hexThreshold(rate)))

  /** Per-source mixing: each row's threshold comes from its source's
    * rate (codegen'd CASE — no join, no shuffle). */
  def mixBySourceRates(df: DataFrame, sourceCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldRight(lit(hexThreshold(defaultRate)): Column) {
      case ((src, rate), acc) => when(col(sourceCol) === src, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashGate(col(idCol)) < threshold)
  }

  /** Deterministic train/val/test assignment: consecutive md5-gate
    * ranges sized by `fractions` (name → share; shares sum to ≤ 1, the
    * LAST split absorbs any remainder so every row lands somewhere).
    * Pure codegen CASE on the scan — no shuffle, no rand(); a row's
    * split never changes as the corpus grows, and holdout membership is
    * reproducible across engines (the exact property eval pipelines
    * need — a train/test leak from reassignment is invisible later). */
  def assignSplits(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "shares must sum to <= 1")
    val cuts = fractions.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val splitCol = fractions.init.zip(cuts).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), cut), acc) =>
        when(hashGate(col(idCol)) < lit(hexThreshold(cut)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", splitCol)
  }

  /** Salted hash gate for epoch upsampling — decorrelated from the
    * plain [[hashGate]] so that mixing (s1) and upsampling decisions
    * are independent for the same id. */
  def epochGate(id: Column): Column =
    substring(md5(concat(id.cast("string"), lit(":epoch"))), 1, 8)

  /** Epoch-weighted upsampling — the "source A for 2.5 epochs, B for
    * 1, C for 0.25" mixing step of a training run. Every row is
    * emitted floor(e) times, plus once more iff its salted md5 gate
    * falls under frac(e) — so a source with e = 2.5 repeats each doc 2
    * or 3 times and the corpus-level expectation is exactly 2.5×, with
    * NO rand(): re-running, re-partitioning, or growing the corpus
    * never changes a given row's repeat count (the reproducibility
    * property checkpointed training needs). Output adds `rep`
    * (0-based repeat index) — downstream sharding treats (id, rep) as
    * the unit. Plan: a codegen CASE computes reps, a bounded explode
    * emits them; no shuffle, no join. */
  def epochMix(df: DataFrame, sourceCol: String, idCol: String,
      epochs: Map[String, Double], defaultEpochs: Double): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 100.0),
      "epochs must be in [0, 100]")
    def whole(e: Double): Long = math.floor(e).toLong
    def fracThr(e: Double): String = hexThreshold(e - math.floor(e))
    val sorted = epochs.toSeq.sortBy(_._1)
    val base = sorted.foldRight(lit(whole(defaultEpochs)): Column) {
      case ((src, e), acc) => when(col(sourceCol) === src, lit(whole(e))).otherwise(acc)
    }
    val thr = sorted.foldRight(lit(fracThr(defaultEpochs)): Column) {
      case ((src, e), acc) => when(col(sourceCol) === src, lit(fracThr(e))).otherwise(acc)
    }
    df.withColumn("__reps", base + when(epochGate(col(idCol)) < thr, 1L).otherwise(0L))
      .filter(col("__reps") > 0)
      .withColumn("rep", explode(expr("sequence(0L, __reps - 1)")))
      .drop("__reps")
  }

  /** Weighted sampling WITHOUT replacement, deterministic — the
    * min-hash race, the integer-exact Efraimidis–Spirakis equivalent
    * (Efraimidis & Spirakis 2006 order items by u^(1/w); the same
    * ordering distribution arises from "item i holds w_i salted
    * lottery tickets, its key is the minimum ticket": P(i's min beats
    * j's) = w_i/(w_i+w_j)). Every ticket is an md5 literal, so the
    * draw reproduces in any engine — no rand(), no ln(). Weights are
    * integers capped at `maxWeight` (the explode cost is Σw — bounded
    * fan-out, same discipline as the span explodes); weight 0 never
    * samples. Returns the k winners as (idCol, race_key), race_key the
    * fixed-width hex minimum (lexicographic = numeric). Scale shape:
    * bounded explode → two-phase min agg → global top-k (TakeOrdered,
    * no full sort shuffle). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      maxWeight: Int = 64): DataFrame =
    // NULL weights mean "no tickets" (coalesce BEFORE least — least()
    // skips nulls, so least(NULL, cap) would hand a null-weight row
    // the MAXIMUM weight instead of excluding it)
    df.withColumn("__w",
        least(coalesce(weight.cast("long"), lit(0L)), lit(maxWeight.toLong)))
      .filter(col("__w") > 0)
      .withColumn("__r", explode(sequence(lit(0L), col("__w") - 1)))
      .groupBy(col(idCol))
      .agg(min(md5(concat_ws(":", lit("ws"), col(idCol).cast("string"),
        col("__r").cast("string")))).as("race_key"))
      .orderBy(col("race_key"), col(idCol))
      .limit(k)

  /** Temperature-sampled source mixing (the mT5/XLM-R scheme: Conneau
    * et al. 2020 §5.1 sample language l with p_l ∝ (n_l/N)^α, α
    * flattening the head so low-resource sources up-sample) in
    * integer-exact form at α = 1/2: source weight w_s =
    * floor(sqrt(n_s)) — sqrt is IEEE correctly-rounded, so the floor
    * is deterministic in any engine and everything after is BIGINT —
    * and source quota = (budget·w_s) div Σw. The quota is then filled
    * deterministically: docs rank within their source by md5(id) (an
    * unbiased shuffle, reproducible, no rand()) and the first quota_s
    * ranks are selected.
    *
    * Scale shape: per-source counts are a two-phase agg collapsing to
    * #sources rows (quotas broadcast back); the within-source rank is
    * [[TwoLevel.exclusiveCumsumBy]] banded on the rank key's first hex
    * char — per-(source, band) parallelism, never one task per source.
    * Returns (idCol, sourceCol, src_rank, quota, selected). */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      budget: Long): DataFrame = {
    val quotas = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val withTotal = quotas.crossJoin(
      broadcast(quotas.agg(sum(col("__w")).as("__tw"))))
      .withColumn("quota", expr(s"($budget * __w) div __tw"))
      .select(col(sourceCol), col("quota"))
    val ranked = TwoLevel.exclusiveCumsumBy(
      df.withColumn("__key", hashGate(col(idCol))),
      lit(1L), col(sourceCol), substring(col("__key"), 1, 1),
      Seq(col("__key"), col(idCol)), "src_rank")
    ranked.join(broadcast(withTotal), Seq(sourceCol))
      .withColumn("selected",
        (col("src_rank") < col("quota")).cast(org.apache.spark.sql.types.LongType))
      .select(col(idCol), col(sourceCol), col("src_rank"), col("quota"),
        col("selected"))
  }

  /** Curriculum schedule (Bengio et al. 2009): rank the corpus
    * easy→hard by a difficulty proxy, deal it into `stages` equal
    * rank-quartile stages, and SHUFFLE within each stage (training
    * wants stage-wise difficulty pacing but no intra-stage order
    * bias — the standard curriculum + shuffle recipe). Integer-exact:
    * stage = (stages·rk) div N over the 0-based global difficulty
    * rank; within-stage positions are md5-rank deals.
    *
    * Scale shape: the global rank is [[TwoLevel.exclusiveCumsum]]
    * banded on the difficulty prefix (monotone along the rank order);
    * the within-stage rank is [[TwoLevel.exclusiveCumsumBy]] — both
    * banded, no corpus-wide single-task window. N re-enters as a
    * broadcast single-row aggregate. Returns
    * (idCol, difficulty, rk, stage, stage_pos). */
  def curriculumSchedule(df: DataFrame, idCol: String, difficulty: Column,
      stages: Int): DataFrame = {
    val t = df.select(col(idCol), difficulty.cast("long").as("difficulty"))
    val ranked = TwoLevel.exclusiveCumsum(t, lit(1L),
      expr("difficulty div 8"), Seq(col("difficulty"), col(idCol)), "rk")
    val staged = ranked
      .crossJoin(broadcast(t.agg(count(lit(1)).as("__n"))))
      .withColumn("stage", expr(s"($stages * rk) div __n")).drop("__n")
      .withColumn("__key", hashGate(col(idCol)))
    TwoLevel.exclusiveCumsumBy(staged, lit(1L), col("stage"),
        substring(col("__key"), 1, 1), Seq(col("__key"), col(idCol)), "stage_pos")
      .select(col(idCol), col("difficulty"), col("rk"), col("stage"),
        col("stage_pos"))
  }

  /** Driver-side rate computation from target shares: rate(s) =
    * min(1, share(s)·totalTarget / count(s)). The per-source counts
    * are one aggregation over the corpus; sources are few by contract
    * (a collect of O(#sources) rows). */
  def ratesForShares(df: DataFrame, sourceCol: String,
      shares: Map[String, Double], totalTarget: Long): Map[String, Double] = {
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.flatMap { case (src, share) =>
      counts.get(src).map(n => src -> math.min(1.0, share * totalTarget / n))
    }
  }
}
