package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental near-dup: deduplicate an ARRIVING BATCH against an
  * EXISTING corpus without recomputing any corpus×corpus pair — the
  * shape every production ingest actually runs (daily crawl slice vs
  * the 100 TB archive). The corpus side is reduced once to signature
  * state (shingles + minhash band keys + set sizes — [[CorpusState]],
  * persistable and reusable across batches; bucket it by doc id via
  * `TableIO.writeBucketed` to make re-joins exchange-free); each batch
  * then:
  *
  *  1. computes its own shingles/signature/bands (batch-sized work),
  *  2. BROADCASTS its band table against the corpus band table — the
  *     batch is small by definition, so candidate generation touches
  *     the corpus bands with a map-side join, no corpus shuffle,
  *  3. verifies candidates with exact Jaccard against the FULL shingle
  *     sets, shuffling only candidate-matched corpus rows.
  *
  * Batch-internal duplicates are [[DedupQueries]] dd2's job (run it on
  * the batch alone — batch-sized); this operator is only the
  * batch-vs-corpus half. Same MinHash family as dd2 (k salted-md5
  * minima, k/rowsPerBand bands), so one precomputed state serves both.
  */
object IncrementalDedup {

  /** Corpus signature state: (shingles, sizes+signature, band keys).
    * Note: docs with fewer words than the shingle size carry no
    * shingles and so no state rows — exact-dup bookkeeping for those
    * lives with the caller (e.g. CurationStream's fingerprint table),
    * not here. */
  final case class CorpusState(shingles: DataFrame, sig: DataFrame, bands: DataFrame)

  def corpusState(corpus: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, k: Int = 8, rowsPerBand: Int = 2): CorpusState = {
    val sh = wordShingles(corpus, idCol, textCol, shingleN)
    val sig = minhashSignature(sh, idCol, k)
    CorpusState(sh, sig, lshBands(sig, idCol, k, rowsPerBand))
  }

  /** Persist state as three parquet tables (each an atomic swap;
    * callers make replays idempotent by gating appends on their
    * exact-dup check). The streaming path uses the bucketed append
    * layer below instead — per-batch cost O(batch), not O(corpus). */
  def writeState(state: CorpusState, dir: String): Unit = {
    graft.core.TableIO.writeAtomicSwap(state.shingles, s"$dir/shingles.parquet")
    graft.core.TableIO.writeAtomicSwap(state.sig, s"$dir/sig.parquet")
    graft.core.TableIO.writeAtomicSwap(state.bands, s"$dir/bands.parquet")
  }

  def readState(spark: org.apache.spark.sql.SparkSession, dir: String): CorpusState =
    CorpusState(
      graft.core.TableIO.read(spark, s"$dir/shingles.parquet"),
      graft.core.TableIO.read(spark, s"$dir/sig.parquet"),
      graft.core.TableIO.read(spark, s"$dir/bands.parquet"))

  /** DFS-safe: resolves the filesystem from the path scheme (HDFS /
    * object store / file: URI), never `java.io.File` — which answers
    * false for any non-local path and silently rebuilds dedup state
    * from scratch, re-admitting duplicates of the whole prior corpus. */
  def stateExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    graft.core.TableIO.exists(spark, s"$dir/sig.parquet")

  // ---------------- bucketed append-only state ----------------
  //
  // The swap-based writeState above rewrites O(corpus) per call; the
  // streaming intake instead keeps each state table as an EXTERNAL
  // BUCKETED parquet table under `dir` (bucketed by doc id, the guard
  // join key) and APPENDS each batch's rows as new bucket files.
  // Existence is checked at the FILE level and the catalog entry is
  // re-registered on demand, so the state survives JVM restarts with
  // the in-memory catalog.

  private val StateTables = Seq("shingles", "sig", "bands")

  /** Deterministic catalog-safe table name for a state table at dir. */
  private def tableName(dir: String, which: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"graft_state_${h}_$which"
  }

  def bucketedStateExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    graft.core.TableIO.exists(spark, s"$dir/sig")

  /** `batch` rows whose `batchKey` does NOT appear in `targetKeys`,
    * computed exchange-free: semi-join the target against the BROADCAST
    * batch keys (map-side scan of the target — the only corpus-sized
    * frame — no shuffle, no sort), then anti-join the batch against the
    * broadcast hit set. Equivalent to `batch LEFT ANTI target` but
    * never redistributes the target, regardless of join-strategy
    * selection. */
  def antiByKey(batch: DataFrame, targetKeys: DataFrame, batchKey: String): DataFrame = {
    val hits = targetKeys.toDF(batchKey)
      .join(broadcast(batch.select(batchKey).distinct()), Seq(batchKey), "left_semi")
    batch.join(broadcast(hits), Seq(batchKey), "left_anti")
  }

  /** Create (first batch) or append (later batches) the bucketed
    * state. Each table is SELF-idempotent: before appending, the batch
    * is guarded against the ids already in THAT table ([[antiByKey]] —
    * per-table existence, so a crash between the three appends heals on
    * replay into exactly the tables that missed the batch). */
  def appendStateBucketed(spark: org.apache.spark.sql.SparkSession,
      batch: CorpusState, dir: String, idCol: String, buckets: Int): Unit = {
    val frames = Map("shingles" -> batch.shingles, "sig" -> batch.sig,
      "bands" -> batch.bands)
    StateTables.foreach { which =>
      val t = tableName(dir, which)
      val path = s"$dir/$which"
      if (!graft.core.TableIO.exists(spark, path)) {
        graft.core.TableIO.writeBucketedAt(frames(which), t, path, Seq(idCol), buckets)
      } else {
        graft.core.TableIO.ensureBucketedAt(spark, t, path, Seq(idCol), buckets)
        graft.core.TableIO.appendBucketed(
          antiByKey(frames(which), spark.table(t).select(idCol), idCol),
          t, Seq(idCol), buckets)
      }
    }
  }

  /** Compact each state table back to one file per bucket. Appends add
    * a file per bucket per batch; run this on a maintenance cadence
    * (e.g. every N batches) to keep scan cost proportional to data,
    * not to batch count. Safe between batches — atomic dir swap with
    * `.prev` rollback per table. */
  def compactStateBucketed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, buckets: Int): Unit =
    StateTables.foreach { which =>
      graft.core.TableIO.compactBucketedAt(spark, tableName(dir, which),
        s"$dir/$which", Seq(idCol), buckets)
    }

  /** Read the bucketed state (re-registering catalog entries if this
    * is a fresh session over surviving files). */
  def readStateBucketed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, buckets: Int): CorpusState = {
    StateTables.foreach { which =>
      graft.core.TableIO.ensureBucketedAt(spark, tableName(dir, which),
        s"$dir/$which", Seq(idCol), buckets)
    }
    CorpusState(
      spark.table(tableName(dir, "shingles")),
      spark.table(tableName(dir, "sig")),
      spark.table(tableName(dir, "bands")))
  }

  /** Fold a batch's own state into the persisted state (append). */
  def appendState(existing: CorpusState, batch: CorpusState): CorpusState =
    CorpusState(
      existing.shingles.unionByName(batch.shingles),
      existing.sig.unionByName(batch.sig),
      existing.bands.unionByName(batch.bands))

  /** Verified near-dup pairs (batch_id, corpus_id, jaccard) at
    * `threshold`, batch vs corpus only. */
  def pairsAgainstCorpus(batch: DataFrame, state: CorpusState, idCol: String,
      textCol: String, threshold: Double, shingleN: Int = 2, k: Int = 8,
      rowsPerBand: Int = 2): DataFrame =
    pairsAgainstState(corpusState(batch, idCol, textCol, shingleN, k, rowsPerBand),
      state, idCol, threshold)

  /** Same, from a precomputed batch state (so a caller that also
    * appends the batch into the persisted state computes its
    * shingles/signature once). */
  def pairsAgainstState(batchState: CorpusState, state: CorpusState, idCol: String,
      threshold: Double): DataFrame = {
    // candidate generation: batch bands broadcast into the corpus band
    // scan — the ONLY corpus-wide operation, and it's map-side
    val cand = state.bands.select(col(idCol).as("corpus_id"), col("band"), col("band_key"))
      .join(broadcast(batchState.bands
          .select(col(idCol).as("batch_id"), col("band"), col("band_key"))),
        Seq("band", "band_key"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    // exact verify over full shingle sets: cand is batch-bounded, so
    // BROADCAST it — the corpus shingle scan stays map-side (no corpus
    // shuffle), and only the candidate-matched rows flow downstream
    val inter = broadcast(cand)
      .join(state.shingles.select(col(idCol).as("corpus_id"), col("shingle")), Seq("corpus_id"))
      .join(batchState.shingles.select(col(idCol).as("batch_id"), col("shingle")),
        Seq("batch_id", "shingle"))
      .groupBy(col("batch_id"), col("corpus_id")).agg(count(lit(1)).as("ninter"))
    inter
      .join(batchState.sig.select(col(idCol).as("batch_id"), col("n").as("nb")), "batch_id")
      .join(state.sig.select(col(idCol).as("corpus_id"), col("n").as("nc")), "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        (col("ninter").cast(DoubleType) / (col("nb") + col("nc") - col("ninter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The batch rows that survive (no corpus near-dup at `threshold`). */
  def newDocs(batch: DataFrame, state: CorpusState, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    batch.join(
      pairsAgainstCorpus(batch, state, idCol, textCol, threshold)
        .select(col("batch_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
