package graft.operators

import graft.core.TableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one shared decision every iterative graph kernel makes: how to
  * pin the STATIC O(E) symmetrized edge table that every round
  * re-joins.
  *
  * Two forms:
  *
  *  - `edgeDir = None` (default, test scale): eager
  *    `localCheckpoint` — truncates lineage and is the fastest pin,
  *    but holds the whole edge table as UNREPLICATED executor-memory
  *    blocks for the lifetime of the run. On a 100 TB graph that is
  *    the big operand sitting in volatile memory for hours: one lost
  *    executor fails the job (a localCheckpoint is not recoverable).
  *
  *  - `edgeDir = Some(dir)` (production): materialize the symmetric
  *    table ONCE through [[TableIO.writeAtomicSwap]] and re-read it.
  *    The table is static across rounds, so this is the cheapest
  *    possible reliable form — every round scans an on-disk parquet
  *    (columnar, splittable, re-readable after any failure), nothing
  *    is pinned in executor memory, and a restarted job resumes from
  *    the already-written table for free. The write costs one extra
  *    pass over E; round joins trade block-manager reads for parquet
  *    scans, which AQE + the shuffle ahead of the join largely hide.
  *
  * Per-round O(V)-state pins stay `localCheckpoint` either way — they
  * are small, rewritten every round, and cheap to recompute one round
  * back; SCALING.md's iterative-graph boundary note carries the full
  * policy.
  */
object GraphEdges {

  /** Undirect + dedup an edge list — the kernels' shared `sym`. */
  def sym(edges: DataFrame, a: String, b: String): DataFrame =
    edges.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()

  /** Pin a static edge operand per the policy above. */
  def pin(df: DataFrame, edgeDir: Option[String]): DataFrame = edgeDir match {
    case None => df.localCheckpoint()
    case Some(dir) =>
      val spark = df.sparkSession
      // idempotent: an existing table (e.g. a restarted run) is reused
      // as-is — the operand is a pure function of the input edges
      if (!TableIO.exists(spark, dir)) TableIO.writeAtomicSwap(df, dir)
      TableIO.read(spark, dir)
  }

  /** Symmetrize then pin — the common kernel entry. */
  def symPinned(edges: DataFrame, a: String, b: String,
      edgeDir: Option[String]): DataFrame =
    pin(sym(edges, a, b), edgeDir)
}
