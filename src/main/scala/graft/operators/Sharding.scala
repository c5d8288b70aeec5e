package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the training-export step
  * after curation and packing: the corpus is re-ordered by an md5 hash
  * of the row id (a reproducible "random" permutation, the same move as
  * [[Sampling.hashGate]]) and dealt round-robin into `nShards` equal
  * shards. Round-robin over the shuffled rank makes shard sizes differ
  * by at most one row BY CONSTRUCTION — no reliance on hash uniformity
  * — and `(shard, pos)` is a pure function of the id set, so re-running
  * on a re-partitioned or grown corpus reproduces every surviving row's
  * slot (cf. the reference's deterministic chunked delivery,
  * `database/java/.../PullFromRdbmsTransformDumpToFS.java` — fixed-size
  * chunks in a stable order; here the order is additionally
  * hash-shuffled, which training loaders need and a column-major export
  * does not).
  *
  * Scale shape: the global rank is the same two-level prefix sum as
  * [[SequencePacking.pack]] — a within-group `row_number` partitioned
  * by the first hash byte (256 groups, contiguous under the hash
  * order), plus an exclusive running total over the 256 per-group
  * counts (one tiny frame). No single-task corpus-wide window; the
  * heavy steps are embarrassingly parallel and the seam is 256 rows
  * regardless of corpus size.
  */
object Sharding {

  /** Adds `shard` and `pos` (both BIGINT): row's shard in [0, nShards)
    * and its position within that shard, under the md5-shuffled global
    * order (`(hashGate(id), id)` — the id tiebreak makes the order
    * total even across md5-prefix collisions). */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // band = first hash byte (256 bands, contiguous under the hash
    // order); exclusive count-rank via the shared two-level seam
    val g = df.withColumn("__gate", Sampling.hashGate(col(idCol)))
    TwoLevel.exclusiveCumsum(g, lit(1L), substring(col("__gate"), 1, 2),
        Seq(col("__gate"), col(idCol)), "__rank")
      .withColumn("shard", col("__rank") % nShards)
      .withColumn("pos", expr(s"__rank div $nShards"))
      .drop("__gate", "__rank")
  }

  /** Materialize the shards as a parquet directory partitioned by
    * `shard`: one clustered directory per shard, rows sorted by `pos`
    * inside each — the layout a training loader streams sequentially.
    * One shuffle keyed by shard; `pos` makes in-shard order explicit
    * rather than an artifact of task scheduling. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, outDir: String): Unit =
    shuffleShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
