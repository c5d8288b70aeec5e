package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted duplicates drop; the earliest of each set is kept") {
    // three tight groups along distinct axes + a singleton; unit-scale
    def v(axis: Int, eps: Double): Seq[Float] =
      (0 until 64).map(j => (if (j == axis) 1.0 else eps)).map(_.toFloat)
    val e = Seq(
      (0L, v(0, 0.00)), (1L, v(0, 0.001)), (2L, v(0, 0.002)), // dup set A
      (10L, v(7, 0.00)), (11L, v(7, 0.001)),                  // dup set B
      (20L, v(30, 0.00))                                      // singleton
    ).toDF("vec_id", "embedding")
    val r = SemanticDedup.dedup(spark, e, k = 3, iters = 2,
        sampleRate = 1.0, tNum = 9, tDen = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(0L) == 1L && r(1L) == 0L && r(2L) == 0L)
    assert(r(10L) == 1L && r(11L) == 0L)
    assert(r(20L) == 1L)
  }

  test("result is deterministic and partitioning-independent") {
    val e = Tables.embeddings(spark, sf0001)
    def run(parts: Int) = SemanticDedup.dedup(spark,
        e.repartition(parts), k = 8, iters = 2, sampleRate = 0.5,
        tNum = 7, tDen = 20)
      .orderBy("vec_id").collect().toSeq
    assert(run(2) == run(11))
  }

  test("pair search never leaves a cell: drops are a subset of within-cell exact pairs") {
    val e = Tables.embeddings(spark, sf0001)
    val r = SemanticDedup.dedup(spark, e, k = 8, iters = 2,
      sampleRate = 0.5, tNum = 7, tDen = 20)
    val cells = r.select(col("vec_id"), col("cell"))
    // brute-force exact pairs over the SAME quantized math, cell-free
    val q = e.select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
      .withColumn("qn", aggregate(transform(col("qv"), x => x * x), lit(0L), (a, v) => a + v))
    val a = q.select(col("vec_id").as("va"), col("qv").as("qva"), col("qn").as("qna"))
    val b = q.select(col("vec_id").as("vb"), col("qv").as("qvb"), col("qn").as("qnb"))
    val allPairs = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("qdot", aggregate(zip_with(col("qva"), col("qvb"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v))
      .filter(col("qdot") > 0 &&
        lit(400L) * col("qdot") * col("qdot") >= lit(49L) * col("qna") * col("qnb"))
      .select(col("va"), col("vb"))
    val sameCell = allPairs
      .join(cells.withColumnRenamed("vec_id", "va").withColumnRenamed("cell", "ca"), "va")
      .join(cells.withColumnRenamed("vec_id", "vb").withColumnRenamed("cell", "cb"), "vb")
      .filter(col("ca") === col("cb"))
      .select(col("vb").as("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val droppedIds = r.filter(col("kept") === 0L)
      .collect().map(_.getLong(0)).toSet
    assert(droppedIds == sameCell,
      "dropped set must equal {later vec of each within-cell exact pair}")
  }

  test("non-unit-scale embeddings raise instead of silently overflowing") {
    val big = Seq((0L, Seq.fill(64)(50.0f)), (1L, Seq.fill(64)(50.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      SemanticDedup.dedup(spark, big, k = 1, iters = 1,
        sampleRate = 1.0, tNum = 7, tDen = 20).collect()
    }
    assert(ex.getMessage.contains("BIGINT-exact bound"))
  }
}
