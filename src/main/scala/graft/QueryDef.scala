package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-level query: the Spark-first implementation plus (when
  * SQL-expressible) an equivalent ANSI-SQL oracle runnable by DuckDB over
  * the same parquet tables. Names/columns must match between the two —
  * the correctness gate sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def all: Seq[Q]
  final def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
