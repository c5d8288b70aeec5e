package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Baseline: brute-force top-k — broadcast the (small) query set against
  * the full corpus; one pass, no shuffle of the corpus, linear in N.
  * Scale path: random-hyperplane LSH bucketing — corpus is hashed once
  * into sign-pattern buckets (shuffle-partitioned by bucket); queries
  * probe only their own bucket, cutting the scanned fraction to
  * ~1/2^planes per probe. Both emit only ranks (no float column) so the
  * oracle compare is robust to float-accumulation order.
  */
object AnnQueries extends QueryModule {

  private val ann1 = Q(
    "q_ann1_bruteforce_topk",
    "brute-force cosine top-5 for 8 query vectors (broadcast queries, single corpus pass)",
    (s, d) => {
      graft.functions.VecExpressions.register(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      broadcast(q).join(e, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(col("qv"), col("embedding")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8)
      SELECT query_id, vec_id AS neighbor_id, rnk FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, e.vec_id ASC) AS rnk
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
      WHERE rnk <= 5 ORDER BY query_id, rnk"""))

  /** Deterministic pseudo-random hyperplanes (fixed seed, no RNG state):
    * plane[i][j] = sin(1 + i*131 + j*7) — reproducible everywhere. */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(i => (0 until dim).map(j => math.sin(1.0 + i * 131 + j * 7)))

  // LSH-bucketed ANN: corpus hashed to 4-plane sign buckets; queries
  // probe their own bucket only. Oracle: rows-only (bucket membership
  // depends on double trig constants; semantics covered by ann1 + spec).
  private val ann2 = Q(
    "q_ann2_lsh_bucketed",
    "LSH-bucketed ANN: hyperplane sign buckets, per-bucket cosine top-3",
    (s, d) => {
      graft.functions.VecExpressions.register(s)
      val e = Tables.embeddings(s, d)
      val ps = planes(4, 64)
      val bucketed = e.select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), ps).as("bucket"))
      val q = bucketed.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      broadcast(q).join(bucketed, Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(col("qv"), col("embedding")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    None)

  override val all: Seq[Q] = Seq(ann1, ann2)
}
