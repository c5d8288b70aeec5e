package graft.operators

import graft.SparkSpec

/** The cast-fuzz in-JVM half: the DataFrame `try_cast` rendering must
  * equal the common-dialect SQL under Spark for every generated query,
  * so the cross-engine gate (q_fz13) isolates Spark-vs-DuckDB cast
  * semantics. Structural lints pin the excluded divergence classes. */
class CastFuzzSpec extends SparkSpec {

  test("same seed generates the identical cast population") {
    val a = CastFuzz.queries().map(_.commonSql)
    assert(a == CastFuzz.queries().map(_.commonSql))
    assert(a != CastFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the cast matrix and its edge arms") {
    val sqls = CastFuzz.queries().map(_.commonSql)
    val all = sqls.mkString("\n")
    Seq("try_cast(", "AS BIGINT", "AS DECIMAL(12,2)", "AS DOUBLE",
      "AS BOOLEAN", "AS DATE", "AS TIMESTAMP", "AS SMALLINT",
      "concat('x', ", "concat('  ', ", "concat('+', ", "concat('00', ",
      "'32')", "replace(", "IS NOT NULL", "GROUP BY",
      "count(DISTINCT").foreach { op =>
      assert(all.contains(op), s"population never generated $op")
    }
    // both timestamp separators (space and T) must appear
    assert(all.contains("' ', CAST(10") || all.contains("concat('  '"),
      "no space-separated timestamp arm")
    assert(all.contains("'T'"), "no T-separated timestamp arm")
    // excluded divergence classes must NEVER be generated:
    for (q <- sqls) {
      assert(!q.contains("'yes'") && !q.contains("'no'"),
        s"English-word boolean is a divergence class: $q")
      assert(!q.contains("e3' AS BIGINT") && !q.contains("0x"),
        s"scientific/hex integer strings diverge: $q")
      assert(!q.contains("'.25') AS BIGINT"),
        s"fractional string to integer diverges (Spark NULL, DuckDB rounds): $q")
      assert(!q.contains("/"), s"non-ISO date separators diverge: $q")
    }
  }

  test(s"property: all ${CastFuzz.NQueries} cast queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = CastFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = CastFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == CastFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > CastFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > CastFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
