package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * k-means-cluster the embedding space, then search for near-duplicate
  * pairs ONLY within each cluster — the cluster assignment replaces the
  * corpus×corpus similarity matrix with k cell-local comparisons, the
  * same cost-bounding shape as the IVF probe ([[IvfIndex]]). A vector is
  * dropped iff some LOWER-id vector in its cell is within the cosine
  * threshold ("keep the earliest of every duplicate set" — deterministic,
  * id-stable under corpus growth, and the rule the exact-dedup gates
  * already use for their keeper pick).
  *
  * All similarity math is the BIGINT-exact quantized form of
  * [[EmbeddingDedup.nearDupPairsExact]]: components quantized to
  * floor(x·1000), `cos ≥ tNum/tDen` tested as
  * `qdot > 0 ∧ tDen²·qdot² ≥ tNum²·|a|²·|b|²`, so the decision is
  * bit-reproducible in any engine and the whole pipeline — INCLUDING the
  * k-means training ([[KMeans.trainSqlCtes]]) — unrolls into the DuckDB
  * oracle.
  *
  * Scale shape: training cost is O(sample·k·iters) (deterministic
  * md5-hash sample); assignment is one map-side pass over broadcast
  * centroids; the pair search shuffles the corpus ONCE keyed by cell and
  * compares within cells only. k grows with the corpus (k ≈ N/target
  * cell size) so per-cell work stays bounded — the knob SemDeDup itself
  * scales with.
  */
object SemanticDedup {

  /** Returns (vec_id, cell, kept): cluster cell and the 0/1 keeper flag
    * under threshold tNum/tDen. `embeddings` needs (vec_id, embedding).
    * `codebookKey`: when set, the k-means training is memoized under it
    * ([[KMeans.trainCached]]) — pass a key that captures the
    * embeddings' identity plus (k, iters, sampleRate); with
    * `codebookSrcDir` also set, the codebook persists as an on-disk
    * artifact fingerprint-keyed to that dataset dir.
    */
  def dedup(spark: SparkSession, embeddings: DataFrame, k: Int, iters: Int,
      sampleRate: Double, tNum: Long, tDen: Long,
      codebookKey: Option[String] = None, codebookSrcDir: String = ""): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a non-negative rational")
    graft.functions.VecExpressions.register(spark)
    // same BIGINT-exactness precondition as nearDupPairsExact: guard
    // sides stay < 2⁶³ only for ~unit-scale inputs; raise, never wrap
    val qnBound = (3.03e9 / math.max(tNum, tDen)).toLong
    val pts = embeddings.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val cent = codebookKey match {
      case Some(key) => KMeans.trainCached(spark,
        Sampling.deterministicSample(pts, "vec_id", sampleRate), k, iters, key,
        codebookSrcDir)
      case None => KMeans.train(spark,
        Sampling.deterministicSample(pts, "vec_id", sampleRate), k, iters)
    }
    val cells = KMeans.assign(pts, cent)
      .withColumn("qn", aggregate(transform(col("qv"), x => x * x),
        lit(0L), (a, v) => a + v))
      .withColumn("qn", when(col("qn") <= qnBound, col("qn")).otherwise(raise_error(concat(
        lit(s"SemanticDedup: quantized norm exceeds the BIGINT-exact bound $qnBound " +
          "(embeddings must be ~unit-scale; normalize before calling) at vec_id="),
        col("vec_id").cast("string")))))
      .select(col("vec_id"), col("cell"), col("qv"), col("qn"))
    val a = cells.select(col("cell"), col("vec_id").as("va"),
      col("qv").as("qva"), col("qn").as("qna"))
    val b = cells.select(col("cell"), col("vec_id").as("vb"),
      col("qv").as("qvb"), col("qn").as("qnb"))
    // within-cell pairs only; one shuffle keyed by cell
    val dropped = a.join(b, Seq("cell")).filter(col("va") < col("vb"))
      .withColumn("qdot", call_function("vec_dot_l", col("qva"), col("qvb")))
      .filter(col("qdot") > 0 &&
        lit(tDen * tDen) * col("qdot") * col("qdot") >= lit(tNum * tNum) * col("qna") * col("qnb"))
      .select(col("vb").as("vec_id")).distinct()
    cells.select(col("vec_id"), col("cell"))
      .join(dropped.withColumn("__dup", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("__dup").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
  }
}
