package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding near-dup as a reusable operator with the multi-table LSH
  * scale path: one hyperplane set catches a 0.8-cosine pair with
  * p = (1 - acos(0.8)/π)^k per table (k=4 ⇒ ≈0.38); running T
  * independent plane sets and unioning candidates lifts recall to
  * 1-(1-p)^T (T=4 ⇒ ≈0.85, T=8 ⇒ ≈0.98) while keeping every single
  * run the same shuffle-by-bucket plan — recall is bought with linear
  * extra passes, never with a corpus cartesian.
  */
object EmbeddingDedup {

  /** Verified near-dup pairs from the union of `tables` independent
    * md5-plane sets (seeded by table index). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double,
      planes: Int = 4, tables: Int = 4, dim: Int = 64): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val cand = (0 until tables).map { t =>
      // distinct plane family per table: salt the md5 derivation by
      // shifting the plane index block
      val signs = planeFamily(t, planes, dim)
      val withB = e.withColumn("bucket", intHyperplaneBucket(col("embedding"), signs))
      val a = withB.select(col("vec_id").as("va"), col("bucket"))
      val b = withB.select(col("vec_id").as("vb"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("va") < col("vb"))
        .select(col("va"), col("vb"))
    }.reduce(_ union _).distinct()
    val ea = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    cand.join(ea, "va").join(eb, "vb")
      .select(col("va"), col("vb"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"))
  }

  /** Quantized frame with the BIGINT-exactness guard: both guard sides
    * of the rational cosine test stay ≤ 2⁶³ iff qna·qnb ≤
    * (3.03e9/max(tNum,tDen))² (with qdot² ≤ qna·qnb by
    * Cauchy–Schwarz). Unit-scale embeddings (‖x‖≈1 ⇒ qn ≈ 10⁶) clear
    * this by orders of magnitude; un-normalized inputs with |x| ≳ 3–5
    * at dim 64 would otherwise OVERFLOW SILENTLY and emit wrong pairs
    * — so the quantized norm is checked per row and raises instead. */
  private def quantGuarded(embeddings: DataFrame, tNum: Long, tDen: Long): DataFrame = {
    val qnBound = (3.03e9 / math.max(tNum, tDen)).toLong
    embeddings.select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x => floor(x.cast(DoubleType) * lit(1000.0)).cast("long")).as("qv"))
      .withColumn("qn", aggregate(transform(col("qv"), x => x * x), lit(0L), (a, v) => a + v))
      .withColumn("qn", when(col("qn") <= qnBound, col("qn")).otherwise(raise_error(concat(
        lit(s"embedding dedup: quantized norm exceeds the BIGINT-exact bound $qnBound " +
          "(embeddings must be ~unit-scale; normalize before calling) at vec_id="),
        col("vec_id").cast("string")))))
  }

  /** Gate-exact variant: same multi-table candidate generation, but
    * the verify is pure BIGINT math — components quantized to
    * floor(x·1000), threshold passed as the rational tNum/tDen, and
    * `cos ≥ t` tested as `qdot > 0 ∧ tDen²·qdot² ≥ tNum²·|a|²·|b|²`
    * (both sides ≤ ~5·10¹⁸ at dim 64, inside BIGINT). No float
    * accumulation anywhere, so any engine reproduces the result
    * bit-for-bit — this is what the DuckDB oracle checks. Production
    * dedup uses [[nearDupPairs]]' float cosine; this form exists so
    * the multi-table recall path has an EXACT cross-engine gate. */
  def nearDupPairsExact(embeddings: DataFrame, tNum: Long, tDen: Long,
      planes: Int = 4, tables: Int = 4, dim: Int = 64): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a non-negative rational")
    graft.functions.VecExpressions.register(embeddings.sparkSession)
    val e = quantGuarded(embeddings, tNum, tDen)
    val cand = (0 until tables).map { t =>
      val signs = planeFamily(t, planes, dim)
      val withB = e.withColumn("bucket", intHyperplaneBucket(col("embedding"), signs))
      val a = withB.select(col("vec_id").as("va"), col("bucket"))
      val b = withB.select(col("vec_id").as("vb"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("va") < col("vb"))
        .select(col("va"), col("vb"))
    }.reduce(_ union _).distinct()
    val qa = e.select(col("vec_id").as("va"), col("qv").as("qva"), col("qn").as("qna"))
    val qb = e.select(col("vec_id").as("vb"), col("qv").as("qvb"), col("qn").as("qnb"))
    cand.join(qa, "va").join(qb, "vb")
      .withColumn("qdot", call_function("vec_dot_l", col("qva"), col("qvb")))
      .filter(col("qdot") > 0 &&
        lit(tDen * tDen) * col("qdot") * col("qdot") >= lit(tNum * tNum) * col("qna") * col("qnb"))
      .select(col("va").as("vec_a"), col("vb").as("vec_b"))
  }

  /** Incremental batch-vs-corpus embedding near-dup (dd7's vector
    * twin): the arriving batch's bucket table BROADCASTS into the
    * corpus bucket scan per plane family — candidate generation is
    * map-side with zero corpus shuffle and no corpus×corpus pair is
    * ever formed; only candidate-matched corpus rows pay the
    * BIGINT-exact verify. Batch must be small relative to the corpus
    * (the incremental-ingest contract). Returns (batch_id, corpus_id). */
  def nearDupAgainstCorpusExact(batch: DataFrame, corpus: DataFrame,
      tNum: Long, tDen: Long,
      planes: Int = 4, tables: Int = 2, dim: Int = 64): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a non-negative rational")
    graft.functions.VecExpressions.register(batch.sparkSession)
    val b = quantGuarded(batch, tNum, tDen)
    val c = quantGuarded(corpus, tNum, tDen)
    val cand = (0 until tables).map { t =>
      val signs = planeFamily(t, planes, dim)
      val bb = b.withColumn("bucket", intHyperplaneBucket(col("embedding"), signs))
        .select(col("vec_id").as("batch_id"), col("bucket"))
      val cb = c.withColumn("bucket", intHyperplaneBucket(col("embedding"), signs))
        .select(col("vec_id").as("corpus_id"), col("bucket"))
      cb.join(broadcast(bb), Seq("bucket"))
        .select(col("batch_id"), col("corpus_id"))
    }.reduce(_ union _).distinct()
    val qb = b.select(col("vec_id").as("batch_id"), col("qv").as("qva"), col("qn").as("qna"))
    val qc = c.select(col("vec_id").as("corpus_id"), col("qv").as("qvb"), col("qn").as("qnb"))
    // cand is batch-bounded, so BROADCAST the (cand ⋈ batch-vectors)
    // side into the corpus scan — the verify stays map-side over the
    // corpus exactly like candidate generation (dd7 precedent:
    // IncrementalDedup.pairsAgainstState); without the hint Catalyst's
    // corpus-derived size estimate for cand plans a SortMergeJoin that
    // shuffles every corpus row's 64-long qv array.
    qc.join(broadcast(cand.join(broadcast(qb), "batch_id")), "corpus_id")
      .withColumn("qdot", call_function("vec_dot_l", col("qva"), col("qvb")))
      .filter(col("qdot") > 0 &&
        lit(tDen * tDen) * col("qdot") * col("qdot") >= lit(tNum * tNum) * col("qna") * col("qnb"))
      .select(col("batch_id"), col("corpus_id"))
  }
}
