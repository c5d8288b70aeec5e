package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** M6 — staging-table build + atomic swap.
  *
  * The reference's bulk GISAID import writes a staging table, then
  * atomically renames it over the live one
  * (`database/R/automation/auto_import_gisaid.R:56-76`). On a
  * file-based engine the same contract is: write the full new table to
  * a staging path, then atomically move it over the live path. Readers
  * either see the complete old table or the complete new one, never a
  * partial write. (On an object store / production catalog this is a
  * partition-pointer or catalog swap; the contract is identical.)
  */
object TableIO {

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** DFS-safe existence check: goes through the Hadoop `FileSystem`
    * resolved from the path's scheme, so it is correct on HDFS / object
    * stores / `file:` URIs alike — `java.io.File` silently answers
    * false for anything that is not a bare local path, which off local
    * disk reads as "no state" and rebuilds from scratch. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Append `df`'s rows to a parquet table as NEW FILES (no rewrite of
    * existing data) — the batch-append half of the streaming-state
    * contract: per-batch cost is O(batch), not O(corpus). Callers own
    * idempotence (guard appends on already-present keys). */
  def appendFiles(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Write df to `<path>.staging`, then atomically swap it in. The
    * previous table is kept at `<path>.prev` until the next swap
    * (cheap rollback, mirroring the reference keeping the old table
    * until vacuum). */
  def writeAtomicSwap(df: DataFrame, path: String): Unit = {
    deleteRecursively(Paths.get(path + ".staging"))
    df.write.mode("overwrite").parquet(path + ".staging")
    swapStaged(path)
  }

  /** Move a fully-written `<path>.staging` over the live dir (previous
    * kept at `<path>.prev`). The non-Spark half of a swap: two renames,
    * no plan execution — which is what makes the multi-table commit
    * loop below tight. */
  private[core] def swapStaged(path: String): Unit = {
    val live = Paths.get(path)
    val staging = Paths.get(path + ".staging")
    val prev = Paths.get(path + ".prev")
    deleteRecursively(prev)
    if (Files.exists(live)) Files.move(live, prev, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, live, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Multi-table atomic commit — the file-based analog of the
    * reference writing sequence + mutation + identifier tables in ONE
    * JDBC transaction (`BatchProcessingWorker.java:443-665`). Two
    * phases:
    *
    *  1. **Stage**: every table's parquet write runs first, to
    *     `<path>.staging`. All live dirs are untouched during this
    *     phase, so the plans may freely read the CURRENT live tables
    *     (the mutation merge reads the live mutation table) — and the
    *     heavy, failure-prone distributed work all happens while the
    *     serving set is still the old consistent version. No
    *     `localCheckpoint`: nothing is pinned on executors, an executor
    *     loss during staging just recomputes lineage.
    *  2. **Swap**: record a swap-intent file (atomic temp+rename
    *     write), then swap every staged dir over its live dir in a
    *     tight rename-only loop, then drop the intent.
    *
    * A crash during staging leaves the live set untouched (stale
    * `.staging` dirs are overwritten next run). A crash between swaps
    * leaves the intent on disk; [[recoverSwapAll]] — called here
    * defensively and by job mains at startup — rolls the commit
    * FORWARD (each staged dir is a complete table), so readers never
    * see a mixed-version serving set longer than the crash window. */
  def writeAtomicSwapAll(tables: Seq[(DataFrame, String)], intentFile: String): Unit = {
    recoverSwapAll(intentFile)
    tables.foreach { case (df, path) =>
      deleteRecursively(Paths.get(path + ".staging"))
      df.write.mode("overwrite").parquet(path + ".staging")
    }
    val intent = Paths.get(intentFile)
    val tmp = Paths.get(intentFile + ".tmp")
    Files.writeString(tmp, tables.map(_._2).mkString("\n"))
    if (Files.exists(intent)) Files.delete(intent)
    Files.move(tmp, intent, StandardCopyOption.ATOMIC_MOVE)
    tables.foreach { case (_, path) => swapStaged(path) }
    Files.delete(intent)
  }

  /** Complete an interrupted [[writeAtomicSwapAll]]: for every path in
    * the recorded intent whose staging dir still exists, finish the
    * swap; already-swapped paths are skipped. Idempotent; returns true
    * when a recovery actually ran. */
  def recoverSwapAll(intentFile: String): Boolean = {
    val intent = Paths.get(intentFile)
    if (!Files.exists(intent)) false
    else {
      Files.readString(intent).split("\n").iterator.filter(_.nonEmpty)
        .foreach { path =>
          if (Files.exists(Paths.get(path + ".staging"))) swapStaged(path)
        }
      Files.delete(intent)
      true
    }
  }

  /** Roll back to the previous table version if one exists. */
  def rollback(path: String): Boolean = {
    val live = Paths.get(path)
    val prev = Paths.get(path + ".prev")
    if (!Files.exists(prev)) false
    else {
      deleteRecursively(live)
      Files.move(prev, live, StandardCopyOption.ATOMIC_MOVE)
      true
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  /** Write a table bucketed (and sorted) by join/merge keys — the
    * SCALING.md co-location contract: two tables bucketed by the same
    * keys into the same bucket count join with ZERO shuffle (Spark
    * reads bucket i of each side into the same task). This is what
    * turns the §3.3 ethid-keyed dedup+joins and the M1 upsert's
    * full-outer join into shuffle-free zippers at 100 TB.
    *
    * Bucketed writes go through the session catalog (`saveAsTable`;
    * works on the in-memory catalog — no Hive needed), with the
    * catalog's warehouse dir as storage. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** EXTERNAL bucketed table at an explicit `path`: the catalog entry
    * is just a pointer + bucket spec over files that OUTLIVE the
    * session (the in-memory catalog does not). [[ensureBucketedAt]]
    * re-registers the entry from the surviving files on a fresh
    * session, so bucketed streaming state is restart-safe: bucket ids
    * are encoded in the file names, and a re-created table over the
    * same files reads with the same exchange-free distribution. */
  /** Pre-shuffle onto the bucket hash so every writing task holds
    * exactly one bucket: repartition(buckets, keys) uses the same
    * murmur hash as the bucket-id assignment, so task i writes bucket
    * i's single file — without this, a bucketed write emits one file
    * per (task × bucket) pair and an append-per-batch state table
    * degenerates into a small-files swamp. */
  private def oneFilePerBucket(df: DataFrame, keys: Seq[String], buckets: Int): DataFrame =
    df.repartition(buckets, keys.map(df.col): _*)

  def writeBucketedAt(df: DataFrame, table: String, path: String,
      keys: Seq[String], buckets: Int): Unit =
    oneFilePerBucket(df, keys, buckets).write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Append a batch to an existing bucketed table as new per-bucket
    * files (matching bucket spec required — Spark validates; one new
    * file per non-empty bucket per append). */
  def appendBucketed(df: DataFrame, table: String,
      keys: Seq[String], buckets: Int): Unit =
    oneFilePerBucket(df, keys, buckets).write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact an external bucketed table back to one file per bucket:
    * snapshot (localCheckpoint — the rewrite replaces the files the
    * plan would lazily re-read), rewrite to a staging path, swap dirs
    * (previous kept at `.prev` like [[writeAtomicSwap]]), re-register.
    * Run periodically on append-heavy state tables: appends add a
    * file per bucket per batch, and scan cost grows with file count
    * even though the data volume doesn't. */
  def compactBucketedAt(spark: SparkSession, table: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    ensureBucketedAt(spark, table, path, keys, buckets)
    val snapshot = spark.table(table).localCheckpoint()
    val staging = table + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    deleteRecursively(Paths.get(path + ".staging"))
    writeBucketedAt(snapshot, staging, path + ".staging", keys, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val live = Paths.get(path)
    val prev = Paths.get(path + ".prev")
    deleteRecursively(prev)
    Files.move(live, prev, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(path + ".staging"), live, StandardCopyOption.ATOMIC_MOVE)
    ensureBucketedAt(spark, table, path, keys, buckets)
  }

  /** Make sure `table` is registered over the bucketed files at
    * `path` — a no-op when the catalog already has it; after a JVM
    * restart (empty in-memory catalog, surviving files) it re-creates
    * the external entry with the schema read from the files. */
  def ensureBucketedAt(spark: SparkSession, table: String, path: String,
      keys: Seq[String], buckets: Int): Unit =
    if (!spark.catalog.tableExists(table)) {
      val schema = spark.read.parquet(path).schema.toDDL
      val ks = keys.mkString(", ")
      spark.sql(s"CREATE TABLE $table ($schema) USING PARQUET " +
        s"CLUSTERED BY ($ks) SORTED BY ($ks) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    }
}
