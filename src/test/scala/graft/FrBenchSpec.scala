package graft
class FrBenchSpec extends SparkSpec {
  test("bench") {
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    df.createOrReplaceTempView("__li")
    // l_partkey is in the ORDER BY: the synthetic lineitem has duplicate
    // (rf, orderkey, linenumber) keys, and a ROWS frame over a non-total
    // order is tie-dependent in ANY engine; with the contribution column
    // in the order, tied rows contribute equally and the checksum is
    // orientation-invariant.
    val q = """SELECT CAST(sum(s) AS BIGINT) FROM (
      SELECT sum(l_partkey % 1000) OVER (PARTITION BY l_returnflag
        ORDER BY l_orderkey, l_linenumber, l_partkey
        ROWS BETWEEN 5 PRECEDING AND UNBOUNDED FOLLOWING) AS s FROM __li)"""
    def time(label: String): Long = {
      val t0 = System.nanoTime()
      val r = spark.sql(q).head().getLong(0)
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s  result=$r")
      r
    }
    spark.conf.set(graft.plans.TailFrameRewrite.ConfKey, "true")
    val on = time("rule ON ")
    spark.conf.set(graft.plans.TailFrameRewrite.ConfKey, "false")
    val off = time("rule OFF")
    spark.conf.set(graft.plans.TailFrameRewrite.ConfKey, "true")
    assert(on == off)
  }
}
