package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Multi-table LSH recall: more plane sets → strictly more of the
  * true near-dup pairs, while each run stays a bucket equi-join. */
class EmbeddingDedupSpec extends SparkSpec {

  private lazy val truth: Set[(Long, Long)] = {
    graft.functions.VecExpressions.register(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      // sf0.001's synthetic embeddings peak at cos≈0.48; 0.40 yields
      // 66 true pairs — enough for a stable recall estimate
      .filter(col("cos") >= 0.40)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("union of independent plane sets increases recall monotonically") {
    import spark.implicits._
    graft.functions.VecExpressions.register(spark)
    val e = Tables.embeddings(spark, sf0001)
    assert(truth.size > 50, s"need true pairs at this threshold, got ${truth.size}")
    def recallWith(tables: Int): Double = {
      val found = EmbeddingDedup.nearDupPairs(e, 0.40, planes = 4, tables = tables)
        .as[(Long, Long)].collect().toSet
      assert(found.subsetOf(truth), "verification must keep only true pairs")
      found.size.toDouble / truth.size
    }
    val r1 = recallWith(1)
    val r8 = recallWith(8)
    // cos 0.40 ⇒ p_table ≈ 0.16-0.20; E[r1] ≈ 0.18, E[r8] ≈ 0.75+
    assert(r8 >= r1, s"recall must not drop with more tables ($r1 -> $r8)")
    assert(r8 > 0.5, s"8 tables should catch most true pairs, got $r8")
  }

  test("exact variant raises on non-unit-scale inputs instead of silently overflowing") {
    import spark.implicits._
    // |x| = 5 at dim 64: qn = 64·5000² ≈ 1.6e9 > the BIGINT-exact bound
    // — the old behavior was wrong pairs with no error
    val big = Seq((0L, Array.fill(64)(5.0f)), (1L, Array.fill(64)(5.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      EmbeddingDedup.nearDupPairsExact(big, 7L, 10L).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("unit-scale"),
      s"expected the overflow guard, got: ${ex.getMessage}")
    // unit-scale inputs pass through the guard untouched
    val ok = Seq((0L, Array.fill(64)(0.125f)), (1L, Array.fill(64)(0.125f)))
      .toDF("vec_id", "embedding")
    assert(EmbeddingDedup.nearDupPairsExact(ok, 7L, 10L).count() == 1L)
  }
}
