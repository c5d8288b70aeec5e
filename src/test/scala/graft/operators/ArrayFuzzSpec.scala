package graft.operators

import graft.SparkSpec

/** The array-fuzz in-JVM half: the DataFrame lambda renderings must
  * equal the Spark-SQL rendering of the same AST for every generated
  * query, so the cross-engine gate (q_fz7, which runs the DuckDB
  * rendering) isolates Spark-vs-DuckDB list semantics. */
class ArrayFuzzSpec extends SparkSpec {

  test("same seed generates the identical array population") {
    val a = ArrayFuzz.queries().map(_.sparkSql)
    assert(a == ArrayFuzz.queries().map(_.sparkSql))
    assert(a != ArrayFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises every list-op family and edge arm") {
    val qs = ArrayFuzz.queries()
    val spark = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    // op families on the Spark rendering
    Seq("transform(", "filter(", "aggregate(", "sort_array(", "reverse(",
      "array_distinct(", "slice(", "try_element_at(", "array_position(",
      "array_contains(", "zip_with(", "array_join(", "size(",
      "array_max(", "collect_list(", "split(").foreach { op =>
      assert(spark.contains(op), s"population never generated $op")
    }
    // and their DuckDB twins
    Seq("list_transform(", "list_filter(", "list_sum(", "list_sort(",
      "list_reverse(", "list_distinct(", "list_slice(", "list_extract(",
      "list_position(", "list_contains(", "generate_series(",
      "array_to_string(", "len(", "list_aggregate(", "list(",
      "string_split(").foreach { op =>
      assert(duck.contains(op), s"DuckDB rendering never emitted $op")
    }
    // the id-cycled edge arms are GUARANTEED, not probabilistic
    assert(spark.contains("nullif("), "no NULL-injecting transform arm")
    assert(spark.contains("x < -99"), "no empty-producing filter arm")
    assert(qs.flatMap(_.sparkSql.split("try_element_at\\(")).drop(1)
      .exists(_.split("\\)")(0).split(", ").last.toIntOption.exists(_ > 400)),
      "no out-of-bounds index arm")
    assert(spark.contains(", -"), "no negative (from-end) index arm")
    // every DuckDB sort is explicit about null placement (the default
    // diverges from Spark — the reason this population dual-renders):
    // each render site emits exactly one 'NULLS …' argument, so the
    // counts must match call-for-call
    def occ(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    assert(occ(duck, "list_sort(") == occ(duck, "'NULLS"),
      "a DuckDB list_sort was rendered without explicit null placement")
  }

  test(s"property: all ${ArrayFuzz.NQueries} array queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("orders", "lineitem"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = ArrayFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = ArrayFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == ArrayFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > ArrayFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > ArrayFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
