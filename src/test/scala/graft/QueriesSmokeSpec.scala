package graft

/** Every SparkEntry query runs end-to-end on sf0.001 without errors
  * (correctness vs the oracle is the driver's DuckDB gate; this guards
  * against runtime regressions in any registered query). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are all registered queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      assert(fn(spark, sf0001).count() >= 0)
    }
  }
}
