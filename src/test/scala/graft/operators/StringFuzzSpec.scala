package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The string-fuzz in-JVM half: the DataFrame rendering (real
  * functions._ Column trees) must equal the common-dialect SQL under
  * Spark for every generated query — so the cross-engine gate (q_fz3)
  * isolates Spark-vs-DuckDB semantics, never DF-vs-SQL drift. */
class StringFuzzSpec extends SparkSpec {

  test("same seed generates the identical string population") {
    val a = StringFuzz.queries().map(_.commonSql)
    val b = StringFuzz.queries().map(_.commonSql)
    assert(a == b)
    assert(a != StringFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the whole op surface") {
    val sqls = StringFuzz.queries().map(_.commonSql).mkString("\n")
    Seq("upper(", "lower(", "trim(", "reverse(", "substring(", "replace(",
      "repeat(", "concat_ws(", "length(", "md5(", "LIKE").foreach { op =>
      assert(sqls.contains(op), s"population never generated $op")
    }
  }

  test(s"property: all ${StringFuzz.NQueries} string queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("part", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = StringFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = StringFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == StringFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > StringFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
  }
}
