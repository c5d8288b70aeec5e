package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** D4 — genetic priority scorer (Nextstrain `priorities.py` port,
  * reference `database/python/priorities_from_database.py:29-119,
  * 224-262`).
  *
  * Semantics (kept faithful to the Python):
  *  - SNP encode vs consensus: non-ACGT chars become 'n' (masked) and
  *    are excluded from the SNP set; maskCount = #masked positions.
  *  - distance(context, focal) = |A_only| + |B_only| + |same-position-
  *    different-base| over the two SNP sets (full merge — unlike D3's
  *    early-break merge; masked-in-one/mutated-in-other counts 1).
  *  - closest focal per context = argmin over d + maskFocal/L.
  *  - crowding: contexts mapped to the same focal are ranked by
  *    d + maskContext/L (reference shuffles first for random
  *    tie-break; we tie-break by context id — documented divergence).
  *  - priority = −d − 0.1 · rank_within_focal (rank 0-based).
  *
  * Spark shape: contexts stream against a broadcast focal set (the
  * reference caps work at 20k context seqs — `utility.R:120-127`; the
  * focal set is the small side). The per-focal ranking is one window.
  */
object Priorities {

  final case class Snp(id: String, positions: Array[Int], bases: Array[Char], maskCount: Int)

  def encode(id: String, consensus: String, aligned: String): Snp = {
    val ref = consensus.toLowerCase
    val s = aligned.toLowerCase
    require(s.length == ref.length, s"sequence $id length != consensus length")
    val mp = Array.newBuilder[Int]; val mb = Array.newBuilder[Char]
    var mask = 0; var i = 0
    while (i < s.length) {
      val b = s.charAt(i)
      if (b != 'a' && b != 'c' && b != 'g' && b != 't') mask += 1
      else if (b != ref.charAt(i)) { mp += i; mb += b }
      i += 1
    }
    Snp(id, mp.result(), mb.result(), mask)
  }

  /** pairsnp distance: exclusive SNPs + shared-position mismatches. */
  def distance(a: Snp, b: Snp): Int = {
    var d = 0; var i = 0; var j = 0
    while (i < a.positions.length && j < b.positions.length) {
      val pa = a.positions(i); val pb = b.positions(j)
      if (pa < pb) { d += 1; i += 1 }
      else if (pa > pb) { d += 1; j += 1 }
      else { if (a.bases(i) != b.bases(j)) d += 1; i += 1; j += 1 }
    }
    d + (a.positions.length - i) + (b.positions.length - j)
  }

  /** (context_id, focal_id, distance, priority). `alignmentLength` is
    * the consensus length L used by both mask penalties. */
  def score(spark: SparkSession, contexts: DataFrame, focals: Seq[Snp], alignmentLength: Int)
      (rowToSnp: org.apache.spark.sql.Row => Snp): DataFrame = {
    import spark.implicits._
    require(focals.nonEmpty, "empty focal set")
    val bc = spark.sparkContext.broadcast(focals)
    val L = alignmentLength.toDouble
    val closest = contexts.rdd.mapPartitions { it =>
      val fs = bc.value
      it.map { row =>
        val c = rowToSnp(row)
        var bestScore = Double.MaxValue; var bestD = 0; var bestF: String = null
        fs.foreach { f =>
          val d = distance(c, f)
          val sc = d + f.maskCount / L
          if (sc < bestScore) { bestScore = sc; bestD = d; bestF = f.id }
        }
        (c.id, bestF, bestD, c.maskCount)
      }
    }.toDF("context_id", "focal_id", "distance", "mask_count")
    val w = Window.partitionBy(col("focal_id"))
      .orderBy((col("distance") + col("mask_count") / lit(L)).asc, col("context_id").asc)
    closest
      .withColumn("rank0", row_number().over(w) - lit(1))
      .select(col("context_id"), col("focal_id"), col("distance"),
        (-col("distance").cast("double") - lit(0.1) * col("rank0")).as("priority"))
  }
}
