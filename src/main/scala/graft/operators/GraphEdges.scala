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

  /** Order-independent content fingerprint of an edge operand:
    * `rowcount:xor(xxhash64(all columns))`. One aggregation pass —
    * cheap relative to the kernel's per-round joins, and the only way
    * "the pinned table is a pure function of the input edges" is a
    * CHECKED invariant rather than a comment. */
  private[operators] def fingerprint(df: DataFrame): String = {
    val h = df.columns.map(c => s"`$c`").mkString("xxhash64(", ", ", ")")
    val row = df.agg(count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor($h)"), lit(0L)).as("x")).head()
    s"${row.getLong(0)}:${row.getLong(1)}"
  }

  private def writeMarker(marker: java.nio.file.Path, fp: String): Unit = {
    val tmp = java.nio.file.Paths.get(marker.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, fp)
    java.nio.file.Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Pin a static edge operand per the policy above.
    *
    * Reuse of an existing `edgeDir` is guarded by a fingerprint marker
    * (`<dir>.fp`, written at materialization): if the incoming edge
    * set no longer matches what was pinned — the input changed since
    * the table was written, or the dir is foreign — every iterative
    * kernel would silently run on the wrong graph, so mismatch fails
    * loudly instead. A pre-marker dir self-heals: its fingerprint is
    * computed from the stored files, checked, then recorded. */
  def pin(df: DataFrame, edgeDir: Option[String]): DataFrame = edgeDir match {
    case None => df.localCheckpoint()
    case Some(dir) =>
      val spark = df.sparkSession
      val marker = java.nio.file.Paths.get(dir + ".fp")
      if (!TableIO.exists(spark, dir)) {
        TableIO.writeAtomicSwap(df, dir)
        writeMarker(marker, fingerprint(TableIO.read(spark, dir)))
      } else {
        val incoming = fingerprint(df)
        val recorded =
          if (java.nio.file.Files.exists(marker))
            java.nio.file.Files.readString(marker).trim
          else { // legacy dir without a marker: fingerprint the files
            val fp = fingerprint(TableIO.read(spark, dir))
            writeMarker(marker, fp)
            fp
          }
        require(recorded == incoming,
          s"pinned edge table at $dir (fingerprint $recorded) does not match " +
            s"the incoming edge set ($incoming); delete the dir to re-materialize")
      }
      TableIO.read(spark, dir)
  }

  /** Symmetrize then pin — the common kernel entry. */
  def symPinned(edges: DataFrame, a: String, b: String,
      edgeDir: Option[String]): DataFrame =
    pin(sym(edges, a, b), edgeDir)
}
