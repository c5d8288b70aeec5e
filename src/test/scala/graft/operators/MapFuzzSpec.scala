package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The map-fuzz in-JVM half: the DataFrame rendering must equal the
  * Spark-SQL rendering of the same AST for every generated query, so
  * the cross-engine gate (q_fz16, which runs the DuckDB rendering)
  * isolates Spark-vs-DuckDB map semantics. Structural lints pin the
  * excluded divergence classes. */
class MapFuzzSpec extends SparkSpec {

  test("same seed generates the identical map population") {
    val a = MapFuzz.queries().map(_.sparkSql)
    assert(a == MapFuzz.queries().map(_.sparkSql))
    assert(a != MapFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population exercises the map surface; divergence classes never generated") {
    val qs = MapFuzz.queries()
    val spark_ = qs.map(_.sparkSql).mkString("\n")
    val duck = qs.map(_.duckSql).mkString("\n")
    // surface coverage (Spark rendering)
    Seq("map(", "map_from_entries(", "try_element_at(", "element_at(",
      "map_concat(", "map_filter(", "transform_values(", "cardinality(",
      "map_keys(", "map_values(", "filter(map_entries(",
      "CAST(0 AS BIGINT)", // the BIGINT-keyed arm
      "CASE WHEN", // the NULL-value arm
      "% 2 = 5" // the forced-empty filter arm (never true)
    ).foreach { op =>
      assert(spark_.contains(op), s"population never generated $op")
    }
    // DuckDB compensating renderings present
    Seq("(element_at(", "))[1]", "list_filter(map_entries(",
      "list_transform(", "array_to_string(", "map_from_entries([",
      "CAST($".replace("$", "") /* varchar casts */).foreach { op =>
      assert(duck.contains(op), s"DuckDB rendering never used $op")
    }
    assert(duck.contains("AS VARCHAR"), "DuckDB casts must be VARCHAR-spelled")
    assert(spark_.contains("AS STRING"), "Spark casts must be STRING-spelled")
    // excluded classes: no GROUP BY over maps, no DISTINCT over maps
    assert(!spark_.contains("GROUP BY"), "maps are not groupable in Spark")
    assert(!spark_.contains("DISTINCT"), "maps are not comparable in Spark")
    // map_concat operands must use disjoint key prefixes (a* vs b*)
    for (q <- qs if q.sparkSql.contains("map_concat(")) {
      assert(q.sparkSql.contains("'a0'") && q.sparkSql.contains("'b0'"),
        s"concat operands must be disjoint-prefixed: ${q.sparkSql}")
    }
  }

  test("no query outputs a raw map/array/struct column (string forms differ across engines)") {
    val qs = MapFuzz.queries()
    for (q <- qs) {
      val schema = q.df(spark, sf0001).schema
      def flat(s: StructType): Seq[org.apache.spark.sql.types.DataType] =
        s.fields.map(_.dataType).toSeq
      flat(schema).foreach {
        case _: MapType | _: ArrayType | _: StructType =>
          fail(s"q${q.id} outputs a nested column: ${schema.simpleString}")
        case _ => ()
      }
    }
  }

  test(s"property: all ${MapFuzz.NQueries} map queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = MapFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = MapFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.sparkSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == MapFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > MapFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
    assert(viaDf.map(_._3).distinct.size > MapFuzz.NQueries / 2,
      "checksums must differ across queries — a degenerate canon tests nothing")
  }
}
