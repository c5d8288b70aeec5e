package graft.operators

import graft.SparkSpec

/** The JSON-fuzz in-JVM half: DF rendering ≡ Spark-SQL rendering for
  * every generated query, so the cross-engine gate (q_fz8, DuckDB
  * rendering) isolates Spark-vs-DuckDB JSON-path semantics. */
class JsonFuzzSpec extends SparkSpec {

  test("same seed generates the identical JSON population") {
    val a = JsonFuzz.queries().map(_.sparkSql)
    assert(a == JsonFuzz.queries().map(_.sparkSql))
    assert(a != JsonFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises every extraction family and edge arm") {
    val qs = JsonFuzz.queries()
    val spark = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    Seq("get_json_object(", "try_cast(", "json_array_length(").foreach { op =>
      assert(spark.contains(op), s"population never generated $op") }
    Seq("json_extract_string(", "json_extract(", "json_valid(").foreach { op =>
      assert(duck.contains(op), s"DuckDB rendering never emitted $op") }
    // the id-cycled arms are GUARANTEED, not probabilistic
    assert(qs.exists(_.base.canBeMalformed),
      "no query over the malformed-document base")
    assert(qs.exists(q => q.base.missingPaths.exists(q.sparkSql.contains)),
      "no missing-path arm")
    // array-index paths and nested-object subtree extraction appear
    assert(spark.contains("["), "no array-index path")
    assert(spark.contains("$.meta'") || spark.contains("$.a'") ||
      spark.contains("$.lines[1]'"), "no object-subtree extraction")
    // EVERY DuckDB extraction wears the json_valid guard (Spark is
    // NULL-on-malformed; unguarded DuckDB errors — the divergence this
    // population exists to pin)
    def occ(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    val extractions = occ(duck, "json_extract_string(") +
      occ(duck, "json_array_length(")
    assert(occ(duck, "json_valid(") == extractions,
      "a DuckDB extraction was rendered without the json_valid guard")
  }

  test(s"property: all ${JsonFuzz.NQueries} JSON queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("orders", "lineitem", "events"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = JsonFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = JsonFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == JsonFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > JsonFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > JsonFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
