package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The LLM-side ordered chain: curate → tokenizer → mix → export under
  * JobRunner — first run executes everything, an unchanged re-run
  * skips everything, and an upstream input change cascades. */
class TrainingPipelineSpec extends SparkSpec {

  test("curate → tokenizer → mix → export: runs, then skips, then cascades on input change") {
    val base = java.nio.file.Files.createTempDirectory("tpipe")
    val docsDir = base.resolve("docs").toString
    // a private copy of the corpus so the cascade test can touch it
    graft.Tables.documents(spark, sf0001)
      .write.parquet(s"$docsDir/documents.parquet")
    val dir = base.resolve("work").toString

    val first = TrainingPipeline.chain(spark, docsDir, dir)
    assert(first.map(_._2.tag) == Seq("ran", "ran", "ran", "ran"), s"got $first")
    for (split <- Seq("train", "val", "test"))
      assert(new java.io.File(s"$dir/shards/split=$split").exists(),
        s"missing $split shards")
    val mix = spark.read.parquet(s"$dir/mix")
    assert(mix.count() > 0, "demo mix must admit documents")
    assert(mix.columns.contains("n_tokens") && mix.columns.contains("text"))
    // the tokenizer stage published the trained vocab as a table:
    // every single char present (feasibility floor), bl = bitlength
    val vocab = spark.read.parquet(s"$dir/tokenizer")
    assert(vocab.columns.toSet == Set("piece", "freq", "bl"))
    assert(vocab.filter(length(col("piece")) === 1).count() > 0)
    assert(vocab.filter(col("bl") =!= length(bin(col("freq")))).count() == 0)

    val second = TrainingPipeline.chain(spark, docsDir, dir)
    assert(second.map(_._2.tag) == Seq("skipped", "skipped", "skipped", "skipped"),
      s"unchanged inputs must skip the whole chain: $second")

    // grow the corpus: the curate fingerprint changes, and because
    // each downstream stage fingerprints its upstream's OUTPUT, the
    // whole chain reruns
    graft.Tables.documents(spark, sf0001)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .write.mode("append").parquet(s"$docsDir/documents.parquet")
    val third = TrainingPipeline.chain(spark, docsDir, dir)
    assert(third.map(_._2.tag) == Seq("ran", "ran", "ran", "ran"),
      s"an input change must cascade: $third")
  }
}
