package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() can short-circuit to metadata for scans). One warmup
  * pass amortizes JIT/codegen; each query is then timed 3× and the
  * MEDIAN reported, with the cache cleared after every execution —
  * cached frames surviving across queries previously caused 10–20 s
  * GC/eviction stalls landing on random queries (±2× instability).
  * Prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 5 passes: sub-second queries carry 0.1–0.6 s scheduler/GC jitter
    // on a busy 32-thread host; a 5-sample median absorbs two outliers
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      val t = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      // query isolation: no cached block outlives its query
      spark.catalog.clearCache()
      t
    }

    def median(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.size / 2)
    }

    // SPARK_GRAFT_ONLY=q_a,q_b narrows the run for targeted iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach(exec) // warmup
    val results = names.map(n => n -> median((1 to passes).map(_ => exec(n))))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // self-record: the driver's log capture truncates long tails, which
    // lost round 2's totals — keep the round record complete on disk
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench_self.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] self-record failed: $e") }
    spark.stop()
  }
}
