package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** Streaming index maintenance: drops appended under frozen codebooks
  * must leave the index probe-equivalent to a full rebuild over
  * everything seen so far — the IvfIndexSpec append law on the
  * file-arrival path, plus restart/replay safety via checkpoints. */
class AnnIndexStreamSpec extends SparkSpec {

  test("two embedding drops: streamed appends ≡ full rebuild; second drop exactly-once") {
    val e = Tables.embeddings(spark, sf0001)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val base = java.nio.file.Files.createTempDirectory("annstream")
    val feed = base.resolve("feed"); java.nio.file.Files.createDirectories(feed)
    val index = base.resolve("index").toString
    val ckpt = base.resolve("ckpt").toString

    // seed the index with the first half, as a batch build would
    val first = e.filter(col("vec_id") % 2 === 0)
    IvfIndex.writeIndex(first, cent, index)

    // the file source lists FILES in feedDir (subdirectories would be
    // partition dirs) — stage each drop as one parquet file at the root
    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = base.resolve(s"tmp_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        feed.resolve(s"$name.parquet"))
    }

    // drop 1: a quarter of the rest
    drop("drop1", e.filter(col("vec_id") % 2 === 1 && col("vec_id") % 4 === 1))
    AnnIndexStream.start(spark, feed.toString, index, cent, ckpt)
      .awaitTermination()

    // drop 2 arrives later; the restarted stream must process ONLY it
    drop("drop2", e.filter(col("vec_id") % 4 === 3))
    AnnIndexStream.start(spark, feed.toString, index, cent, ckpt)
      .awaitTermination()

    // the streamed index now holds every vector exactly once
    val streamed = spark.read.parquet(index)
    assert(streamed.count() == e.count(), "every vector exactly once")
    assert(streamed.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).count() == 0, "no replayed duplicates")

    // probe equivalence against a from-scratch rebuild
    val rebuilt = base.resolve("rebuilt").toString
    IvfIndex.writeIndex(e, cent, rebuilt)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val a = IvfIndex.probe(spark, index, queries, cent, nprobe = 2, k = 3)
      .orderBy(col("query_id"), col("rnk")).collect().map(_.toSeq).toSeq
    val b = IvfIndex.probe(spark, rebuilt, queries, cent, nprobe = 2, k = 3)
      .orderBy(col("query_id"), col("rnk")).collect().map(_.toSeq).toSeq
    assert(a == b, "streamed appends must be probe-equivalent to a rebuild")
  }
}
