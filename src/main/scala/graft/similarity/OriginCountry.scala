package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.util.Arrays

/** D3 — k-NN origin-country estimator.
  *
  * Re-expresses `origincountry/OriginCountryEstimator.java:91-271`:
  *
  *  - k stratified reference subsamples, sized proportionally to case
  *    counts per country with cap `least(0.1·N, maxTotal)`
  *    (the SQL at :126-167 → window-rank sampling here, J8)
  *  - per query sequence × subsample: country of the closest reference
  *    by mutation-list distance
  *  - distance (:230-271): sorted merge over (position, base) mutation
  *    lists; a mutation present in only one sample counts 1 UNLESS that
  *    position is unknown (non-ACGT) in the other sample; same position
  *    different base counts 1. The reference's merge loop stops when
  *    either list is exhausted (trailing exclusive mutations uncounted)
  *    — reproduced faithfully and flagged here as a reference quirk.
  *  - tie-break: the reference flips an unseeded coin; we keep the
  *    FIRST minimum in reference order (deterministic) — divergence
  *    documented per SURVEY §7.4.1.
  */
object OriginCountry {

  final case class MutSample(
      id: String,
      country: String,
      mutPositions: Array[Int],   // sorted ascending
      mutBases: Array[Char],
      unknownPositions: Array[Int]) // sorted ascending (non-ACGT sites)

  /** Extract (mutations vs reference, unknown positions) from an
    * aligned sequence — feeder for MutSample when only seqs exist. */
  def encode(id: String, country: String, reference: String, aligned: String): MutSample = {
    val ref = reference.toUpperCase
    val s = aligned.toUpperCase
    require(s.length == ref.length, "align first")
    val mp = Array.newBuilder[Int]; val mb = Array.newBuilder[Char]; val up = Array.newBuilder[Int]
    var i = 0
    while (i < s.length) {
      val b = s.charAt(i)
      val known = b == 'A' || b == 'C' || b == 'G' || b == 'T' || b == '-'
      if (!known) up += (i + 1)
      else if (b != ref.charAt(i)) { mp += (i + 1); mb += b }
      i += 1
    }
    MutSample(id, country, mp.result(), mb.result(), up.result())
  }

  /** The reference's exact distance (incl. the early-break quirk). */
  def distance(a: MutSample, b: MutSample): Int = {
    var d = 0; var i = 0; var j = 0
    while (i < a.mutPositions.length && j < b.mutPositions.length) {
      val pa = a.mutPositions(i); val pb = b.mutPositions(j)
      if (pa > pb) {
        if (Arrays.binarySearch(a.unknownPositions, pb) < 0) d += 1
        j += 1
      } else if (pa < pb) {
        if (Arrays.binarySearch(b.unknownPositions, pa) < 0) d += 1
        i += 1
      } else {
        if (a.mutBases(i) != b.mutBases(j)) d += 1
        i += 1; j += 1
      }
    }
    d
  }

  /** Country of the closest reference sample; first minimum wins
    * (deterministic replacement for the reference's coin flip). */
  def closestCountry(sample: MutSample, refs: Seq[MutSample]): (String, Int) = {
    var best = Int.MaxValue; var country: String = null
    refs.foreach { r =>
      val d = distance(sample, r)
      if (d < best) { best = d; country = r.country }
    }
    (country, best)
  }

  /** J8 stratified subsample: per-country share of `totalWanted`
    * proportional to `n_cases`, hash-ordered when seed==None (engine-
    * portable) or rand(seed)-ordered. Input df needs (countryCol). */
  def stratifiedSample(df: DataFrame, countryCol: String, casesPerCountry: DataFrame,
      totalWanted: Long, seed: Option[Long]): DataFrame = {
    val totalCases = casesPerCountry.agg(sum(col("n_cases"))).head().getLong(0)
    val withWant = df.join(broadcast(casesPerCountry), Seq(countryCol))
      .withColumn("n_wanted", ceil(col("n_cases") * lit(totalWanted.toDouble) / lit(totalCases.toDouble)))
    val order = seed.map(s => rand(s)).getOrElse(md5(col("id").cast("string")))
    val w = Window.partitionBy(col(countryCol)).orderBy(order, col("id"))
    withWant.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("n_wanted"))
      .drop("__rn", "n_wanted", "n_cases")
  }

  /** Distributed estimation: queries × k broadcast reference subsample
    * sets → one (query, set_idx, country, distance) row per set, like
    * the reference's 10 votes per sample. Reference sets are bounded
    * (≤10k each per BASELINE) so they broadcast; the query side streams
    * through mapPartitions without shuffling. */
  def estimate(spark: SparkSession, queries: DataFrame, refSets: Seq[Seq[MutSample]])
      (rowToSample: org.apache.spark.sql.Row => MutSample): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(refSets)
    queries.rdd.mapPartitions { it =>
      val sets = bc.value
      it.flatMap { row =>
        val s = rowToSample(row)
        sets.zipWithIndex.map { case (refs, k) =>
          val (country, d) = closestCountry(s, refs)
          (s.id, k, country, d)
        }
      }
    }.toDF("id", "ref_set", "estimated_country", "distance")
  }

  /** Majority vote over the per-set estimates (deterministic tie-break
    * by country name). */
  def majorityVote(estimates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("n_votes").desc, col("estimated_country").asc)
    estimates.groupBy(col("id"), col("estimated_country"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("estimated_country"), col("n_votes"))
  }
}
