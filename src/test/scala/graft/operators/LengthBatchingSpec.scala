package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-batching guarantees: the banded two-level rank is
  * bit-identical to the naive global window, batches are full and
  * length-contiguous, and bucketing beats random batching on the
  * padding objective it exists to minimize. */
class LengthBatchingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i * 37 % 200 + 1).toLong))
      .toDF("doc_id", "n_tokens")
  }

  test("banded two-level rank equals the naive global window") {
    val d = docs(500)
    val w = Window.orderBy(col("n_tokens").asc, col("doc_id").asc)
    val naive = d.withColumn("rk", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), expr("rk div 16").as("b"), (col("rk") % 16).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val banded = LengthBatching.batches(d, "doc_id", "n_tokens", 16)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("batch_id"), r.getAs[Long]("batch_pos")))).toMap
    assert(banded == naive)
  }

  test("batches are full (last may be partial) and length-contiguous") {
    val stats = LengthBatching.padStats(
      LengthBatching.batches(docs(100), "doc_id", "n_tokens", 16), "n_tokens")
      .orderBy(col("batch_id")).collect()
    assert(stats.length == 7) // ceil(100/16)
    assert(stats.dropRight(1).forall(_.getAs[Long]("n_rows") == 16L))
    assert(stats.last.getAs[Long]("n_rows") == 4L)
    // consecutive batches never overlap in length range
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_tokens") <= b.getAs[Long]("min_tokens"))
    }
  }

  test("length bucketing strictly beats hash-random batching on total padding") {
    val d = docs(480)
    def totalPad(batched: org.apache.spark.sql.DataFrame): Long =
      LengthBatching.padStats(batched, "n_tokens")
        .agg(sum(col("pad_tokens"))).head().getLong(0)
    val bucketed = totalPad(LengthBatching.batches(d, "doc_id", "n_tokens", 16))
    // random = the Sharding md5 permutation dealt into the same shape
    val random = totalPad(Sharding.shuffleShards(d, "doc_id", 30)
      .withColumnRenamed("shard", "batch_id"))
    assert(bucketed < random,
      s"bucketed padding $bucketed must beat random $random")
  }
}
