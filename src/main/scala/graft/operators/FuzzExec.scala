package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared execution plumbing for the 32 differential-fuzz gates — the
  * round-15 optimization single point for the three fixed overheads
  * every gate was paying per GENERATED query (guide §1.2 step 1: fix
  * the distributed algorithm before the per-task work):
  *
  *  1. '''Driver-pool width.''' Each generated query reduces to one
  *     bounded (qid, n_rows, checksum) row via its own Spark job, so
  *     in-flight queries are the gate's ONLY parallelism source for
  *     the scan-side stages: the driver's parquet inputs are
  *     single-row-group files (unsplittable — one scan task however
  *     the split configs are set), which makes a generated query's
  *     pre-exchange work effectively serial. The historical fixed
  *     8-thread pool therefore left 3/4 of a 32-core host idle during
  *     the fuzz tier. [[poolSize]] scales with the session's
  *     parallelism instead; at 8 cores the floor keeps the historical
  *     width so low-core driver runs are unchanged.
  *
  *  2. '''Table resolution.''' `spark.read.parquet` performs a file
  *     listing + a footer schema read per call; resolving each table
  *     once per SESSION instead of once per generated query removes
  *     O(queries × tables × bench passes) driver-side resolutions.
  *     The shared object is an immutable DataFrame PLAN — nothing is
  *     cached or persisted; every job still computes from parquet.
  *
  * A third candidate — repartitioning the unsplittable single-row-
  * group inputs after the read (guide §2.5, input skew) — was measured
  * and REJECTED: the added per-query exchange costs far more than the
  * intra-query parallelism buys at this row count (OptProbe: fz1
  * 15.3 s memo-only → ~30 s with the repartition; the gate-level
  * sweep put fz5 at 3.2× its memo-only time). Cross-query pool
  * concurrency already fills the cores.
  */
object FuzzExec {

  /** Driver-pool width for per-generated-query jobs. Measured on the
    * two extreme gate shapes at sf0.1/local[32] (OptProbe + targeted
    * bench): shuffle-bearing gates (fz1) are flat in pool width — each
    * generated query's exchanges already fan to shuffle-partition
    * tasks — while CPU-bound single-task-scan gates (fz26's per-row
    * JSON) are serialized by the pool. Half the session parallelism,
    * floored at the historical 8 (low-core driver runs keep their
    * round-14 shape), capped at 16 (fz1 degrades past that); env
    * SPARK_GRAFT_FUZZ_POOL overrides for cluster tuning. */
  def poolSize(spark: SparkSession): Int =
    sys.env.get("SPARK_GRAFT_FUZZ_POOL").map(_.toInt).getOrElse {
      val cores = spark.sparkContext.defaultParallelism
      math.min(16, math.max(8, cores / 2))
    }

  /** Memoized table resolver — the drop-in replacement for the
    * harnesses' scattered `spark.read.parquet(s"$dir/$t.parquet")`
    * sites. Delegates to [[Tables.t]], the one session-scoped,
    * freshness-stamped plan memo (see its scaladoc for the staleness
    * guard), so fuzz harnesses and production gates share a single
    * policy. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(spark, dir, name)

  /** [[Tables.events]] (memoized via [[Tables.t]]): same
    * TIMESTAMP(NANOS)/(MICROS) normalization seam, one footer read per
    * session instead of one per generated query. */
  def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
}
