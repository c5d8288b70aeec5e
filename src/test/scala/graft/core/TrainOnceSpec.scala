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

  test("vacuum: unused artifacts past the TTL go; in-use and fresh ones survive; retrain works") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    def write(dir: String): Unit = {
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "part.txt"), "x")
    }
    val t = System.nanoTime()
    val oldKey = s"spec:vac-old:$t"
    val freshKey = s"spec:vac-fresh:$t"
    val inUseKey = s"spec:vac-inuse:$t"
    val oldPath = TrainOnce.artifactDir(oldKey)(write)
    val freshPath = TrainOnce.artifactDir(freshKey)(write)
    val inUsePath = TrainOnce.artifactDir(inUseKey)(write)
    // simulate age: backdate old + in-use; then forget the memory tier
    // EXCEPT re-resolve inUse so the dirCache marks it live
    Files.setLastModifiedTime(Paths.get(oldPath), FileTime.fromMillis(1000L))
    Files.setLastModifiedTime(Paths.get(inUsePath), FileTime.fromMillis(1000L))
    TrainOnce.clearMemoryForTest()
    TrainOnce.artifactDir(inUseKey)(write) // back in dirCache…
    Files.setLastModifiedTime(Paths.get(inUsePath), FileTime.fromMillis(1000L)) // …but old on disk
    val removed = TrainOnce.vacuum(ttlMillis = 60L * 60 * 1000)
    assert(removed >= 1)
    assert(!Files.exists(Paths.get(oldPath)), "stale unused artifact must be deleted")
    assert(Files.exists(Paths.get(freshPath)), "fresh artifact survives")
    assert(Files.exists(Paths.get(inUsePath)), "in-use artifact survives even when old")
    // a deleted artifact is not an error: the next request retrains
    TrainOnce.clearMemoryForTest()
    var rewrites = 0
    val back = TrainOnce.artifactDir(oldKey) { dir =>
      rewrites += 1; write(dir)
    }
    assert(rewrites == 1 && Files.exists(Paths.get(back, "part.txt")))
  }

  test("touch-on-use: re-resolving an artifact in a fresh JVM refreshes its mtime") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    def write(dir: String): Unit = {
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "part.txt"), "x")
    }
    val key = s"spec:vac-touch:${System.nanoTime()}"
    val p = TrainOnce.artifactDir(key)(write)
    Files.setLastModifiedTime(Paths.get(p), FileTime.fromMillis(1000L))
    TrainOnce.clearMemoryForTest() // "fresh JVM"
    TrainOnce.artifactDir(key)(write)
    assert(Files.getLastModifiedTime(Paths.get(p)).toMillis > 1000L,
      "first use per JVM must refresh the last-used stamp")
  }
}
