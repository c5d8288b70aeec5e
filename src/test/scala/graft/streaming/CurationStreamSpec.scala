package graft.streaming

import graft.SparkSpec
import graft.core.TableIO

/** Streaming corpus intake: each drop dedupes within itself, then
  * against everything already accepted — across micro-batches, via
  * PERSISTED signature/fingerprint state (no corpus text rescans). */
class CurationStreamSpec extends SparkSpec {

  private def writeDrop(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
    val w = new java.io.PrintWriter(s"$dir/$name", "UTF-8")
    docs.foreach { case (id, text) => w.println(s"""{"doc_id":$id,"text":"$text"}""") }
    w.close()
  }

  test("drops dedupe within batch, against the corpus, and replays are idempotent") {
    val base = java.nio.file.Files.createTempDirectory("curstream").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    // drop 1: one keeper + an exact in-batch dup
    writeDrop(dropDir, "d1.jsonl", Seq(1L -> doc, 2L -> doc))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt1").awaitTermination()
    val after1 = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(1L))
    // state tables materialized alongside the corpus
    assert(graft.operators.IncrementalDedup.stateExists(state))
    assert(TableIO.read(spark, s"$state/fp.parquet").count() == 1)

    // drop 2: a near-dup of doc 1, an exact dup of doc 1, and a fresh doc
    writeDrop(dropDir, "d2.jsonl", Seq(
      10L -> doc.replace("kappa", "lambda"),
      11L -> doc,
      12L -> "completely different content with nothing shared at all here today"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt1").awaitTermination()
    val after2 = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1L, 12L), s"got $after2")
    // accepted docs' signature state accumulated (2 docs × shingle rows)
    assert(TableIO.read(spark, s"$state/sig.parquet").count() == 2)

    // replay from a FRESH checkpoint (both files re-delivered): the
    // corpus must not grow — everything is now a dup of itself
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt2").awaitTermination()
    val after3 = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after3 == Set(1L, 12L), s"replay must be a no-op, got $after3")
    assert(TableIO.read(spark, s"$state/fp.parquet").count() == 2)
  }

  test("a doc shorter than the shingle width flows through on fp guarantees alone") {
    val base = java.nio.file.Files.createTempDirectory("curshort").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    writeDrop(dropDir, "d1.jsonl", Seq(
      1L -> "ok",  // 1 token: no bigram shingles, no sig/band rows
      2L -> "a longer document with enough words for shingles"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    assert(TableIO.read(spark, corpus).count() == 2)
    assert(TableIO.read(spark, s"$state/fp.parquet").count() == 2)
    assert(TableIO.read(spark, s"$state/sig.parquet").count() == 1) // only doc 2

    // replay: the shingle-less doc must still dedupe (via fp, its only
    // guard) instead of re-appending
    writeDrop(dropDir, "d2.jsonl", Seq(10L -> "ok"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val ids = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L), s"shingle-less dup slipped through: $ids")
  }

  test("crash window between corpus and fp/state writes replays without duplicates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("curcrash").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    writeDrop(dropDir, "d1.jsonl", Seq(
      1L -> "first document with enough words to shingle nicely today"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()

    // simulate the torn batch: doc 2 reached the CORPUS but the crash
    // hit before the fp/state swaps (the worst ordering for duplicates)
    val torn = "second document that crashed between the corpus and state writes"
    TableIO.writeAtomicSwap(
      TableIO.read(spark, corpus).unionByName(Seq(2L -> torn).toDF("doc_id", "text")),
      corpus)
    assert(TableIO.read(spark, s"$state/fp.parquet").count() == 1) // fp missed doc 2

    // the replayed drop re-delivers doc 2: the corpus-side id guard
    // must skip it while fp/state catch up
    writeDrop(dropDir, "d2.jsonl", Seq(2L -> torn))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val docs = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(docs == Seq(1L, 2L), s"duplicate append after torn batch: $docs")
    assert(TableIO.read(spark, s"$state/fp.parquet").count() == 2)
    assert(TableIO.read(spark, s"$state/sig.parquet").count() == 2)
  }
}
