package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The parameterized quantile-register core: the merge law must be
  * SHARDING-INDEPENDENT — any shard assignment yields a valid sketch
  * whose rank estimates stay within its own recomputed bound
  * Σ(strideᵢ−1). That invariance is what licenses the production
  * `registersByPartition` form (shard = input partition, no
  * single-task corpus sort) while the gates pin fixed key-modulus
  * shards for cross-engine determinism. */
class QuantileRegisterSpec extends SparkSpec {

  private val ties = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  private val K = 64L

  private def base = Tables.lineitem(spark, sf0001).select(
    floor(col("l_quantity")).cast("long").as("q"),
    col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))

  /** (probe → true rank) over the full multiset. */
  private def trueRanks(df: DataFrame, probes: Seq[Long]): Map[Long, Long] = {
    val qs = df.select(col("q")).collect().map(_.getLong(0)).sorted
    probes.map(x => x -> qs.count(_ <= x).toLong).toMap
  }

  private def checkInvariance(reg: DataFrame, shardCols: Seq[String],
      truth: Map[Long, Long], maxShardRows: Long, label: String): Unit = {
    val rows = reg.collect()
    val perShard = rows.groupBy(r => shardCols.map(r.getAs[Any]).mkString("|"))
    assert(perShard.values.forall(_.length <= maxShardRows),
      s"$label: a shard exceeded K register rows")
    val bound = QuantileRegister.mergeBound(reg, shardCols).head().getLong(0)
    val regQW = rows.map(r => (r.getAs[Long]("q"), r.getAs[Long]("w")))
    for ((x, t) <- truth) {
      val est = regQW.filter(_._1 <= x).map(_._2).sum
      assert(est >= t && est <= t + bound,
        s"$label probe $x: est $est outside [$t, ${t + bound}]")
    }
  }

  test("shard-count invariance: 1 / 4 / 16 key-modulus shards all satisfy their own bound") {
    val probes = (5L to 50L by 5L).toSeq
    val truth = trueRanks(base, probes)
    for (s <- Seq(1, 4, 16)) {
      val reg = QuantileRegister.registers(
        base.withColumn("shard", col("l_suppkey") % s),
        "q", ties, Seq("shard"), K)
      checkInvariance(reg, Seq("shard"), truth, K, s"shards=$s")
      assert(reg.count() <= s * K, s"register table exceeds shards*K at s=$s")
    }
  }

  test("registersByPartition: the production sharding satisfies the same bound") {
    val probes = (5L to 50L by 5L).toSeq
    val truth = trueRanks(base, probes)
    for (nPart <- Seq(3, 9)) {
      val reg = QuantileRegister.registersByPartition(
        base.repartition(nPart), "q", ties, K)
      checkInvariance(reg, Seq("shard"), truth, K, s"byPartition($nPart)")
      // structural: the rank window is partitioned (never a
      // single-task corpus sort — the round-9 weak mark)
      val windows = reg.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
    }
  }

  test("grouped: per-key registers satisfy each key's own bound under any sharding") {
    val grouped = Tables.lineitem(spark, sf0001).select(
      col("l_returnflag").as("grp"),
      floor(col("l_quantity")).cast("long").as("q"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val probes = (10L to 40L by 10L).toSeq
    val perGroupTruth = grouped.select(col("grp"), col("q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (g, xs) =>
        g -> probes.map(x => x -> xs.map(_._2).count(_ <= x).toLong).toMap
      }
    for (s <- Seq(2, 8)) {
      val reg = QuantileRegister.registers(
        grouped.withColumn("shard", col("l_suppkey") % s),
        "q", ties, Seq("shard"), K, grpCols = Seq("grp"))
      val bounds = QuantileRegister.mergeBound(reg, Seq("shard"), Seq("grp"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = reg.collect()
        .map(r => (r.getString(0), r.getAs[Long]("q"), r.getAs[Long]("w")))
      assert(bounds.keySet == perGroupTruth.keySet)
      for ((g, truth) <- perGroupTruth; (x, t) <- truth) {
        val est = rows.filter(r => r._1 == g && r._2 <= x).map(_._3).sum
        assert(est >= t && est <= t + bounds(g),
          s"grp=$g shards=$s probe $x: est $est outside [$t, ${t + bounds(g)}]")
      }
    }
  }

  test("gate pins are byte-stable: sp12 output equals the pre-refactor register rule") {
    // the refactor's contract: the shared core with the gate's pinned
    // shard key reproduces the historical (shard, rn, q, w) rows —
    // recomputed here directly from the stride definition
    val reg = SparkEntry_sp12(spark)
    val byHand = {
      val rows = base.withColumn("shard", col("l_suppkey") % 8)
        .select(col("shard"), col("q"), col("l_orderkey").cast("long"),
          col("l_linenumber").cast("long"), col("l_partkey").cast("long"),
          col("l_suppkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      rows.groupBy(_._1).toSeq.flatMap { case (shard, xs) =>
        val sorted = xs.sortBy(t => (t._2, t._3, t._4, t._5, t._6))
        val n = sorted.length.toLong
        val m = (n + K - 1) / K
        // least power of two ≥ m: highestOneBit(m−1)·2 (m ≥ 2)
        val w = if (m <= 1) 1L else java.lang.Long.highestOneBit(m - 1) * 2
        sorted.zipWithIndex.collect {
          case (t, i) if i.toLong % w == 0 => (shard, i.toLong + 1, t._2, w)
        }
      }.sorted
    }
    assert(reg == byHand)
  }

  private def SparkEntry_sp12(s: org.apache.spark.sql.SparkSession) =
    graft.SparkEntry.queries("q_sp12_quantile_registers")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
}
