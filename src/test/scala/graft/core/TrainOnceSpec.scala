package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class TrainOnceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def trainDf(v: Long) = {
    import spark.implicits._
    Seq((1L, v), (2L, v + 1)).toDF("k", "v")
  }

  test("hit serves the stored rows without re-running the training plan") {
    var trainings = 0
    def trained = { trainings += 1; trainDf(10L) }
    val first = TrainOnce.cached(spark, "spec:hit", schema)(trained)
      .orderBy(col("k")).collect().toSeq
    val second = TrainOnce.cached(spark, "spec:hit", schema)(trained)
      .orderBy(col("k")).collect().toSeq
    assert(trainings == 1, "second call must be a cache hit")
    assert(first == second)
    assert(first.map(r => (r.getLong(0), r.getLong(1))) == Seq(1L -> 10L, 2L -> 11L))
  }

  test("different keys train independently (no cross-key collision)") {
    val a = TrainOnce.cached(spark, "spec:a", schema)(trainDf(100L))
      .agg(sum(col("v"))).head().getLong(0)
    val b = TrainOnce.cached(spark, "spec:b", schema)(trainDf(200L))
      .agg(sum(col("v"))).head().getLong(0)
    assert(a == 201L && b == 401L)
  }

  test("the returned frame is consumable by multiple plans (broadcast-join shape)") {
    val model = TrainOnce.cached(spark, "spec:join", schema)(trainDf(7L))
    import spark.implicits._
    val probe = Seq(1L, 2L, 3L).toDF("k")
    val joined = probe.join(broadcast(model), Seq("k"), "left")
      .agg(sum(coalesce(col("v"), lit(0L)))).head().getLong(0)
    assert(joined == 15L)
  }

  // ---- disk tier -------------------------------------------------------

  private def tempSrcDir(marker: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("trainonce-src-")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), marker)
    dir.toString
  }

  test("disk tier: a fresh 'process' (cleared memory) READS the artifact instead of retraining") {
    val src = tempSrcDir("v1")
    var trainings = 0
    def trained = { trainings += 1; trainDf(30L) }
    val first = TrainOnce.cachedOnDisk(spark, "spec:disk", src, schema)(trained)
      .orderBy(col("k")).collect().toSeq
    TrainOnce.cachedOnDisk(spark, "spec:disk", src, schema)(trained) // memory hit
    assert(trainings == 1)
    TrainOnce.clearMemoryForTest() // simulate a fresh JVM (disk artifacts survive)
    val reread = TrainOnce.cachedOnDisk(spark, "spec:disk", src, schema)(trained)
      .orderBy(col("k")).collect().toSeq
    assert(trainings == 1, "fresh process must read the persisted artifact, not retrain")
    assert(reread == first)
  }

  test("disk tier: regenerating the source data in place changes the key and retrains") {
    val src = tempSrcDir("v1")
    var trainings = 0
    def trained = { trainings += 1; trainDf(trainings * 100L) }
    val v1 = TrainOnce.cachedOnDisk(spark, "spec:regen", src, schema)(trained)
      .agg(sum(col("v"))).head().getLong(0)
    // in-place regeneration: same path, new content + mtime (the
    // driver rebuilds /root/testdata exactly like this between rounds)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src).resolve("data.txt"), "v2-regenerated")
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(src).resolve("data.txt"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val v2 = TrainOnce.cachedOnDisk(spark, "spec:regen", src, schema)(trained)
      .agg(sum(col("v"))).head().getLong(0)
    assert(trainings == 2, "fingerprint change must retrain")
    assert(v1 == 201L && v2 == 401L)
  }

  test("artifactDir: written once, survives a memory clear, atomic path is stable") {
    var writes = 0
    val key = s"spec:artdir:${System.nanoTime()}"
    def write(dir: String): Unit = {
      writes += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part.txt"), "x")
    }
    val p1 = TrainOnce.artifactDir(key)(write)
    val p2 = TrainOnce.artifactDir(key)(write)
    TrainOnce.clearMemoryForTest()
    val p3 = TrainOnce.artifactDir(key)(write)
    assert(writes == 1, "artifact must be written exactly once")
    assert(p1 == p2 && p2 == p3)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p1, "part.txt")))
  }
}
