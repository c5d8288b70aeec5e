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
    * exact-dup check). At scale, write `shingles`/`bands` bucketed by
    * their join keys (TableIO.writeBucketed) for exchange-free
    * re-joins. */
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

  def stateExists(dir: String): Boolean =
    new java.io.File(s"$dir/sig.parquet").exists()

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
    // exact verify over full shingle sets: shuffles only candidates
    val inter = cand
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
