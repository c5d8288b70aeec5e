package graft.tools

import graft.GraftSession
import graft.operators.{FuzzExec, RelFuzz}
import org.apache.spark.sql.DataFrame

/** Round-15 measurement probe (guide §1: measure first). Quantifies the
  * fixed per-generated-query overheads the fuzz gates pay, so the
  * cross-cutting fix (FuzzExec: pool width, shared table resolution,
  * unsplittable-input spread) is sized by evidence instead of guessed.
  *
  * Not a gate, not benched by the driver; run by hand:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.OptProbe"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // 1. raw relation-resolution cost (file listing + footer read)
    time("read.parquet(lineitem) x1 (cold)") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
    }
    time("read.parquet(lineitem) x50") {
      (1 to 50).foreach(_ => spark.read.parquet(s"$sfDir/lineitem.parquet"))
    }
    time("read.parquet(nation) x50") {
      (1 to 50).foreach(_ => spark.read.parquet(s"$sfDir/nation.parquet"))
    }

    // 2. fz1 end-to-end under (pool, memo, spread) variants
    def runFz1(pool: Int, rd: String => DataFrame): Unit = {
      import scala.collection.parallel.CollectionConverters._
      val fj = new java.util.concurrent.ForkJoinPool(pool)
      val ts = new scala.collection.parallel.ForkJoinTaskSupport(fj)
      val par = RelFuzz.queries().par
      par.tasksupport = ts
      try {
        val rows = par.map { q =>
          val r = RelFuzz.fingerprint(q, q.df(spark, rd)).head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }.toList.sortBy(_._1)
        require(rows.size == RelFuzz.NQueries)
      } finally fj.shutdown()
    }
    def plainRd: String => DataFrame =
      t => spark.read.parquet(s"$sfDir/$t.parquet")
    // memo without spread, built per variant run (plan-only, like FuzzExec.table)
    def memoRd: String => DataFrame = {
      val m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      t => m.computeIfAbsent(t, n => spark.read.parquet(s"$sfDir/$n.parquet"))
    }
    // the production path: FuzzExec's session-scoped memo
    def prodRd: String => DataFrame = t => FuzzExec.table(spark, sfDir, t)
    def variants = Seq(
      ("pool=8  memo=0 (r14 shape)", 8, () => plainRd),
      ("pool=8  memo=1", 8, () => memoRd),
      ("pool=16 memo=1", 16, () => memoRd),
      ("pool=24 memo=1", 24, () => memoRd),
      ("pool=32 memo=1", 32, () => memoRd),
      ("pool=16 memo=1 (FuzzExec.table)", 16, () => prodRd))
    // warmup once (JIT/codegen), then two timed reps per variant
    runFz1(8, plainRd)
    for ((label, pool, rd) <- variants; rep <- 1 to 2)
      time(s"fz1 $label rep$rep")(runFz1(pool, rd()))

    spark.stop()
  }
}
