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

  /** Shared 4-plane ±1 hyperplane set over the 64-dim embeddings
    * (md5-derived — see [[graft.functions.VectorFunctions.md5SignPlanes]]);
    * integer-exact, so the DuckDB oracle computes identical buckets. */
  private[operators] val lshSigns: Seq[Seq[Int]] = md5SignPlanes(4, 64)

  // LSH-bucketed ANN: corpus hashed to 4-plane sign buckets; queries
  // probe their own bucket only (expected scan fraction ~1/16 of the
  // corpus per probe). Bucket ids are BIGINT arithmetic → the oracle
  // reproduces them exactly from the same ±1 literals.
  private val ann2 = Q(
    "q_ann2_lsh_bucketed",
    "LSH-bucketed ANN: hyperplane sign buckets, per-bucket cosine top-3",
    (s, d) => {
      graft.functions.VecExpressions.register(s)
      val e = Tables.embeddings(s, d)
      val bucketed = e.select(col("vec_id"), col("embedding"),
        intHyperplaneBucket(col("embedding"), lshSigns).as("bucket"))
      val q = bucketed.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      // the query set is O(1) (8 probes) — broadcast is scale-safe
      broadcast(q).join(bucketed, Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine(col("qv"), col("embedding")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding,
               ${intHyperplaneBucketSql("embedding", lshSigns)} AS bucket
        FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
            FROM b WHERE vec_id < 8)
      SELECT query_id, vec_id AS neighbor_id, rnk FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, e.vec_id ASC) AS rnk
        FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.query_id)
      WHERE rnk <= 3 ORDER BY query_id, rnk"""))

  override val all: Seq[Q] = Seq(ann1, ann2)
}
