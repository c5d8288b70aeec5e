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
