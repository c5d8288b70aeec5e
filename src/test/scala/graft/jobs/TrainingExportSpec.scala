package graft.jobs

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.functions._

class TrainingExportSpec extends SparkSpec {

  test("export writes split=/shard= layout; windows conserve each split's tokens") {
    val docs = graft.Tables.documents(spark, sf0001)
    val cfg = TrainingExport.Config(
      fractions = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2), nShards = 4)
    val out = java.nio.file.Files.createTempDirectory("texport").toString
    TrainingExport.writeExport(docs, out, cfg)

    val back = spark.read.parquet(out)
    val splits = back.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
    assert(back.select("split", "shard").distinct().count() == 12, "4 shards per split")

    // token conservation per split: the windows of a split carry exactly
    // the chunk tokens of the docs ASSIGNED to that split — a doc
    // leaking across the boundary would double-count
    val (curated, _) = CorpusCuration.run(docs, cfg.curation)
    val assigned = Sampling.assignSplits(curated, "doc_id", cfg.fractions)
    val expectedTokens = graft.operators.TextQueries.chunkFrame(assigned)
      .join(assigned.select("doc_id", "split"), "doc_id")
      .groupBy("split").agg(sum("n_chunk_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotTokens = back.groupBy("split").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotTokens == expectedTokens, s"got $gotTokens expected $expectedTokens")
  }

  test("epoch weights upsample the train split only; integer epochs are token-exact") {
    val docs = graft.Tables.documents(spark, sf0001)
    val base = TrainingExport.Config(
      fractions = Seq("train" -> 0.7, "val" -> 0.3), nShards = 2)
    val cfg = base.copy(epochs = Map("src0" -> 2.0, "src1" -> 3.0), defaultEpochs = 1.0)

    def tokens(c: TrainingExport.Config): Map[String, Long] = {
      val out = java.nio.file.Files.createTempDirectory("texport3").toString
      TrainingExport.writeExport(docs, out, c)
      spark.read.parquet(out).groupBy("split").agg(sum("n_tokens").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val plain = tokens(base)
    val mixed = tokens(cfg)
    // val split untouched by upsampling
    assert(mixed("val") == plain("val"))
    // integer epochs: train tokens = Σ source-multiplier × source tokens
    val (curated, _) = CorpusCuration.run(docs, base.curation)
    val train = Sampling.assignSplits(curated, "doc_id", base.fractions)
      .filter(col("split") === "train")
    val bySource = graft.operators.TextQueries.chunkFrame(train)
      .join(train.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(sum("n_chunk_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = bySource.map { case (src, t) =>
      t * Map("src0" -> 2L, "src1" -> 3L).getOrElse(src, 1L)
    }.sum
    assert(mixed("train") == expected, s"got ${mixed("train")} expected $expected")
  }

  test("export is deterministic: two runs produce identical window sets") {
    val docs = graft.Tables.documents(spark, sf0001).filter(col("doc_id") < 120)
    val cfg = TrainingExport.Config(
      fractions = Seq("train" -> 0.7, "val" -> 0.3), nShards = 2)
    def snapshot(): Set[(String, Long, String)] = {
      val out = java.nio.file.Files.createTempDirectory("texport2").toString
      TrainingExport.writeExport(docs, out, cfg)
      spark.read.parquet(out)
        .select(col("split"), col("bin_id"), md5(col("bin_text")).as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    }
    assert(snapshot() == snapshot())
  }
}
