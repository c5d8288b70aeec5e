package graft.operators

import graft.{SparkSpec, Tables}

/** In-JVM half of the temporal differential: DataFrame rendering ≡
  * Spark-SQL rendering of the same common-dialect string, over the
  * NORMALIZED events frame registered as the view (the same seam the
  * gate's DataFrame side reads through — raw events.parquet reads are
  * forbidden, its ts physical type varies by testdata generation). */
class TemporalFuzzSpec extends SparkSpec {

  private lazy val registered: Unit =
    Tables.events(spark, sf0001).createOrReplaceTempView("events")

  test("same seed generates the identical temporal population") {
    val a = TemporalFuzz.queries(seed = 7L, n = 20).map(_.commonSql)
    val b = TemporalFuzz.queries(seed = 7L, n = 20).map(_.commonSql)
    assert(a == b)
    assert(a != TemporalFuzz.queries(seed = 8L, n = 20).map(_.commonSql))
  }

  test("population covers every truncation unit (incl. week) and every EXTRACT field") {
    val units = TemporalFuzz.queries().map(_.unit).toSet
    val truncs = units.filterNot(_.startsWith("extract:"))
    assert(truncs == Set("hour", "day", "week", "month", "quarter", "year"),
      s"got $truncs")
    assert(units.filter(_.startsWith("extract:")) ==
      Set("extract:day", "extract:hour", "extract:minute"), s"got $units")
    // the new predicate/having constructs are exercised too
    val qs = TemporalFuzz.queries()
    assert(qs.exists(_.predSql.exists(_.contains("TIMESTAMP '"))), "ts-literal predicates present")
    assert(qs.exists(_.havingGt.nonEmpty), "HAVING present")
  }

  test(s"property: all ${TemporalFuzz.NQueries} temporal queries — DataFrame ≡ Spark-SQL") {
    registered
    val viaDf = TemporalFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaSql = TemporalFuzz.fingerprintAll(spark, sf0001, q => spark.sql(q.commonSql))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaDf.size == TemporalFuzz.NQueries)
    val diverging = viaDf.keys.filter(k => viaDf(k) != viaSql(k)).toSeq.sorted
    assert(diverging.isEmpty,
      s"renderings diverge for qids $diverging — e.g. ${TemporalFuzz.queries()
        .filter(q => diverging.contains(q.id.toLong)).take(3).map(_.commonSql)}")
  }

  test("row-level agreement on a sample") {
    registered
    TemporalFuzz.queries().filter(_.id % 7 == 0).foreach { q =>
      val a = q.df(spark, sf0001).collect().map(_.toSeq).toSet
      val b = spark.sql(q.commonSql).collect().map(_.toSeq).toSet
      assert(a == b, s"q${q.id} row sets differ: ${q.commonSql}")
    }
  }
}
