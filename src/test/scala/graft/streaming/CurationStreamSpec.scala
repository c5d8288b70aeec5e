package graft.streaming

import graft.SparkSpec
import graft.core.TableIO
import graft.operators.IncrementalDedup
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Streaming corpus intake: each drop dedupes within itself, then
  * against everything already accepted — across micro-batches, via
  * PERSISTED bucketed signature/fingerprint state that is APPENDED per
  * batch (no corpus rescans, no corpus-sized rewrites, no shuffle of
  * any state table). */
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
    assert(IncrementalDedup.bucketedStateExists(spark, state))
    assert(TableIO.read(spark, s"$state/fp").count() == 1)

    // drop 2: a near-dup of doc 1, an exact dup of doc 1, and a fresh doc
    writeDrop(dropDir, "d2.jsonl", Seq(
      10L -> doc.replace("kappa", "lambda"),
      11L -> doc,
      12L -> "completely different content with nothing shared at all here today"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt1").awaitTermination()
    val after2 = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1L, 12L), s"got $after2")
    // accepted docs' signature state accumulated (2 docs × sig rows)
    assert(TableIO.read(spark, s"$state/sig").count() == 2)

    // replay from a FRESH checkpoint (both files re-delivered): the
    // corpus must not grow — everything is now a dup of itself
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt2").awaitTermination()
    val after3 = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after3 == Set(1L, 12L), s"replay must be a no-op, got $after3")
    assert(TableIO.read(spark, s"$state/fp").count() == 2)
    assert(TableIO.read(spark, s"$state/sig").count() == 2)
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
    assert(TableIO.read(spark, s"$state/fp").count() == 2)
    assert(TableIO.read(spark, s"$state/sig").count() == 1) // only doc 2

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
    // hit before the fp/state appends (the worst ordering for duplicates)
    val torn = "second document that crashed between the corpus and state writes"
    TableIO.appendFiles(Seq(2L -> torn).toDF("doc_id", "text"), corpus)
    assert(TableIO.read(spark, s"$state/fp").count() == 1) // fp missed doc 2

    // the replayed drop re-delivers doc 2: the corpus-side id guard
    // must skip it while fp/state catch up
    writeDrop(dropDir, "d2.jsonl", Seq(2L -> torn))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val docs = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(docs == Seq(1L, 2L), s"duplicate append after torn batch: $docs")
    assert(TableIO.read(spark, s"$state/fp").count() == 2)
    assert(TableIO.read(spark, s"$state/sig").count() == 2)
  }

  test("state re-joins never shuffle or rewrite a state table (VERDICT r4 item 2)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("curplan").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    writeDrop(dropDir, "d1.jsonl", (1L to 20L).map(i =>
      i -> s"document number $i with plenty of distinct words to shingle over"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val fpFiles1 = new java.io.File(s"$state/fp").listFiles().count(_.getName.endsWith(".parquet"))

    // the batch-vs-state join shapes, exactly as the stream builds them
    val batch = Seq(1L -> "document number 1 with plenty of distinct words to shingle over",
      99L -> "an entirely new arrival that matches nothing in the corpus at all")
      .toDF("doc_id", "text")
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val seenCheck = IncrementalDedup.antiByKey(batch,
      CurationStream.fpTable(spark, state, 8).select("fp"), "__fp")
    val st = IncrementalDedup.readStateBucketed(spark, state, "doc_id", 8)
    val dupCheck = IncrementalDedup.pairsAgainstState(
      IncrementalDedup.corpusState(batch, "doc_id", "text"), st, "doc_id", 0.7)

    def stateShuffles(df: org.apache.spark.sql.DataFrame): Seq[ShuffleExchangeExec] =
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains(state))
          case _ => false
        } => e
      }
    // no ShuffleExchange anywhere above a state-table scan: the guards
    // are broadcast semi→anti, the band probe broadcasts the batch side
    assert(stateShuffles(seenCheck).isEmpty, "fp seen-check shuffled the fp table")
    assert(stateShuffles(dupCheck).isEmpty, "near-dup check shuffled the signature state")
    // the seen-check plan is fully shuffle-free (both joins broadcast)
    assert(seenCheck.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e }.isEmpty, "seen-check must be broadcast-only")
    assert(seenCheck.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(99L))

    // appends add files; they never rewrite the existing state
    writeDrop(dropDir, "d2.jsonl", Seq(
      99L -> "an entirely new arrival that matches nothing in the corpus at all"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val fpFiles2 = new java.io.File(s"$state/fp").listFiles().count(_.getName.endsWith(".parquet"))
    assert(fpFiles2 > fpFiles1, "second batch must append new fp bucket files")
    assert(TableIO.read(spark, s"$state/fp").count() == 21)
  }

  test("compaction collapses per-batch bucket files; results and later batches unchanged") {
    val base = java.nio.file.Files.createTempDirectory("curcompact").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    def parquets(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    // four batches of fresh docs → ≥4 append generations of bucket files
    (1 to 4).foreach { b =>
      writeDrop(dropDir, s"d$b.jsonl", (1L to 5L).map(i =>
        (b * 100L + i) -> s"batch $b document $i has its own unmistakably distinct wording"))
      CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    }
    val before = parquets(s"$state/fp")
    assert(before > 8, s"appends should accumulate files, got $before")
    val fpBefore = TableIO.read(spark, s"$state/fp").collect().map(_.toString).sorted.toSeq

    CurationStream.compactState(spark, state)
    assert(parquets(s"$state/fp") <= 8, "compaction must leave ≤ one file per bucket")
    assert(parquets(s"$state/sig") <= 8)
    assert(TableIO.read(spark, s"$state/fp").collect().map(_.toString).sorted.toSeq
      == fpBefore, "compaction must not change the data")

    // the stream keeps working against the compacted state: a replayed
    // doc still drops, a fresh one still lands
    writeDrop(dropDir, "d5.jsonl", Seq(
      101L -> "batch 1 document 1 has its own unmistakably distinct wording",
      999L -> "a wholly new post-compaction document that matches nothing else"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt").awaitTermination()
    val n = TableIO.read(spark, corpus).count()
    assert(n == 21, s"expected 20 originals + 1 fresh, got $n")
  }

  test("bucketed state survives a catalog wipe (fresh-session restart)") {
    val base = java.nio.file.Files.createTempDirectory("currestart").toString
    val dropDir = s"$base/drops"; new java.io.File(dropDir).mkdirs()
    val corpus = s"$base/corpus.parquet"
    val state = s"$base/state"
    val doc = "restart safety document with enough words for stable shingles"
    writeDrop(dropDir, "d1.jsonl", Seq(1L -> doc))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt1").awaitTermination()

    // simulate a JVM restart with the in-memory catalog: drop THIS
    // state dir's graft_state_<md5(dir)>_* entries — files survive,
    // catalog entries do not
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(state.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(s"graft_state_$h"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))

    // a near-dup arriving after the "restart" must still be caught —
    // readStateBucketed / fpTable re-register the tables from the files
    writeDrop(dropDir, "d2.jsonl", Seq(
      7L -> doc.replace("shingles", "shingling"),
      8L -> "genuinely fresh content that shares no phrasing with anything"))
    CurationStream.start(spark, dropDir, corpus, state, s"$base/ckpt2",
      stateBuckets = 8).awaitTermination()
    val ids = TableIO.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 8L), s"state lost across catalog wipe: $ids")
  }
}
