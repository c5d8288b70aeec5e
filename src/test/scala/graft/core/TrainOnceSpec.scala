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
}
