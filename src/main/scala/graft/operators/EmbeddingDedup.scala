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
      val signs = md5SignPlanes((t + 1) * planes, dim).drop(t * planes)
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
}
