package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The in-JVM half of the differential fuzz: for the whole seeded
  * population, the DataFrame rendering and the common-dialect SQL
  * rendering (executed by Spark SQL over temp views) must agree — the
  * driver's DuckDB run of the SAME SQL strings is the cross-engine
  * half. Plus: generator determinism and fingerprint sensitivity. */
class RelFuzzSpec extends SparkSpec {

  private lazy val registered: Unit =
    RelFuzz.queries().flatMap(_.tables).distinct.foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    }

  test("same seed generates the identical population (SQL strings are a pure function of seed)") {
    val a = RelFuzz.queries(seed = 42L, n = 30).map(_.commonSql)
    val b = RelFuzz.queries(seed = 42L, n = 30).map(_.commonSql)
    val c = RelFuzz.queries(seed = 43L, n = 30).map(_.commonSql)
    assert(a == b)
    assert(a != c, "a different seed must rotate the population")
  }

  test(s"property: all ${RelFuzz.NQueries} generated queries — DataFrame plan ≡ Spark-SQL rendering") {
    registered
    val viaDf = RelFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaSql = RelFuzz.fingerprintAll(spark, sf0001, q => spark.sql(q.commonSql))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaDf.size == RelFuzz.NQueries)
    val diverging = viaDf.keys.filter(k => viaDf(k) != viaSql(k)).toSeq.sorted
    assert(diverging.isEmpty,
      s"renderings diverge for qids $diverging — e.g. ${RelFuzz.queries()
        .filter(q => diverging.contains(q.id.toLong)).take(3).map(_.commonSql)}")
  }

  test("row-level agreement on a sample (fingerprints could in principle collide)") {
    registered
    RelFuzz.queries().filter(_.id % 11 == 0).foreach { q =>
      val a = q.df(spark, sf0001).collect().map(_.toSeq).toSet
      val b = spark.sql(q.commonSql).collect().map(_.toSeq).toSet
      assert(a == b, s"q${q.id} row sets differ: ${q.commonSql}")
    }
  }

  test("fingerprint is order-insensitive but value-sensitive") {
    import spark.implicits._
    val q = RelFuzz.queries().head
    val base = Seq(("x", 1L), ("y", 2L)).toDF(q.outCols.head, "ignore")
      .select(col(q.outCols.head))
    // build a 1-output-col probe matching q's first column name only
    val fp1 = RelFuzz.fingerprint(q.copy(groupCols = Seq(q.outCols.head),
      aggs = Seq.empty, projCols = Seq(q.outCols.head)), base).collect().head
    val fp2 = RelFuzz.fingerprint(q.copy(groupCols = Seq(q.outCols.head),
      aggs = Seq.empty, projCols = Seq(q.outCols.head)),
      base.orderBy(col(q.outCols.head).desc)).collect().head
    assert(fp1.getLong(2) == fp2.getLong(2), "row order must not change the checksum")
    val fp3 = RelFuzz.fingerprint(q.copy(groupCols = Seq(q.outCols.head),
      aggs = Seq.empty, projCols = Seq(q.outCols.head)),
      base.withColumn(q.outCols.head, lit("z"))).collect().head
    assert(fp1.getLong(2) != fp3.getLong(2), "changed values must change the checksum")
  }
}
