package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 103L).toDF("id")

  test("two-level rank matches the single global window bit-for-bit") {
    val got = Sharding.shuffleShards(ids, "id", 8)
      .orderBy("id").collect().toSeq
    val wGlobal = Window.orderBy(Sampling.hashGate(col("id")), col("id"))
    val naive = ids
      .withColumn("rk", row_number().over(wGlobal).cast("long") - 1)
      .withColumn("shard", col("rk") % 8)
      .withColumn("pos", expr("rk div 8"))
      .drop("rk")
      .orderBy("id").collect().toSeq
    assert(got == naive)
  }

  test("round-robin: shard sizes differ by at most one; (shard,pos) is a bijection") {
    val s = Sharding.shuffleShards(ids, "id", 8)
    val sizes = s.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max - sizes.min <= 1)
    assert(s.select("shard", "pos").distinct().count() == 103)
  }

  test("assignment is independent of input partitioning") {
    val one = Sharding.shuffleShards(ids.repartition(1), "id", 5)
      .orderBy("id").collect().toSeq
    val many = Sharding.shuffleShards(ids.repartition(13), "id", 5)
      .orderBy("id").collect().toSeq
    assert(one == many)
  }

  test("the corpus-sized window is partitioned; only the 256-group seam is global") {
    val s = Sharding.shuffleShards(ids, "id", 8)
    val windows = s.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.size == 1, s"expected 1 seam window, got ${windows.size}")
    assert(global.head.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "global window must sit on the per-group aggregate, not the corpus")
  }

  test("writeShards produces one readable clustered directory per shard") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeShards(ids, "id", 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 103)
    assert(back.select("shard").distinct().count() == 4)
    // every id lands exactly once with its deterministic slot
    val expect = Sharding.shuffleShards(ids, "id", 4)
      .orderBy("id").collect().toSeq
    // partition-column type inference reads `shard` back as int
    assert(back.select(col("id"), col("shard").cast("long"), col("pos"))
      .orderBy("id").collect().toSeq == expect)
  }
}
