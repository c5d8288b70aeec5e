package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The subquery-fuzz in-JVM half plus the [[Subqueries]] membership
  * forms: the DataFrame renderings (semi/anti joins, the decomposed
  * shuffle-scale NOT IN, aggregate-then-join scalars) must equal the
  * common-dialect SQL — Spark's own subquery compilation — for every
  * generated query, so the cross-engine gate (q_fz6) isolates
  * Spark-vs-DuckDB semantics. */
class SubqueryFuzzSpec extends SparkSpec {

  test("same seed generates the identical subquery population") {
    val a = SubqueryFuzz.queries().map(_.commonSql)
    assert(a == SubqueryFuzz.queries().map(_.commonSql))
    assert(a != SubqueryFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises every subquery family and three-valued arm") {
    val sqls = SubqueryFuzz.queries().map(_.commonSql)
    val all = sqls.mkString("\n")
    Seq("EXISTS (", "NOT EXISTS (", "NOT IN (", " IN (",
      "count(*)", "max(", "nullif(").foreach { op =>
      assert(all.contains(op), s"population never generated $op")
    }
    // the NOT IN NULL traps must be GUARANTEED, not probabilistic
    assert(sqls.exists(q => q.contains("NOT IN (SELECT nullif")),
      "no NOT IN with a nullable inner operand (the empties-everything arm)")
    assert(sqls.exists(q => q.contains("nullif") && q.contains("NOT IN")),
      "no NOT IN with a nullable operand")
    assert(sqls.exists(q => q.matches("(?s).*nullif\\([^)]*\\) IN \\(.*")),
      "no IN with a nullable outer operand")
  }

  test(s"property: all ${SubqueryFuzz.NQueries} subquery queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("orders", "customer", "lineitem"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = SubqueryFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = SubqueryFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == SubqueryFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > SubqueryFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
  }

  test("Subqueries.notIn: exact NOT IN semantics on every three-valued arm") {
    import spark.implicits._
    val outer = Seq((1, Some(10)), (2, Some(20)), (3, None), (4, Some(40)))
      .toDF("k", "x")
    def sqlNotIn(subRows: Seq[Option[Int]]): Set[Int] = {
      outer.createOrReplaceTempView("__o")
      subRows.toDF("y").createOrReplaceTempView("__s")
      spark.sql("SELECT k FROM __o WHERE x NOT IN (SELECT y FROM __s)")
        .collect().map(_.getInt(0)).toSet
    }
    def oursNotIn(subRows: Seq[Option[Int]]): Set[Int] =
      Subqueries.notIn(outer, col("x"), subRows.toDF("y"))
        .select("k").collect().map(_.getInt(0)).toSet
    val cases = Seq(
      Seq(Some(10), Some(20)),          // plain: 4 survives, NULL x dropped
      Seq(Some(10), Some(20), None),    // NULL element: empties everything
      Seq.empty[Option[Int]],           // empty subquery: ALL survive, even NULL x
      Seq(None),                        // only-NULL subquery: empty
      Seq(Some(99)))                    // disjoint: non-null rows survive
    for (c <- cases)
      assert(oursNotIn(c) == sqlNotIn(c), s"case $c")
    // and the decomposed form's MEMBERSHIP join is a plain hash join
    // on the value (shuffle-joinable at any inner size — the whole
    // point vs Spark's broadcast-only null-aware anti join); the only
    // nested-loop element is the ONE-ROW stats broadcast, which is
    // size-independent by construction
    val p = Subqueries.notIn(outer, col("x"), Seq(Some(1)).toDF("y"))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashJoin") && p.contains("__sq_v"),
      s"membership must be a hash join on the subquery value:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Subqueries.in: plain semi join matches SQL IN incl. NULLs") {
    import spark.implicits._
    val outer = Seq((1, Some(10)), (2, Some(20)), (3, None)).toDF("k", "x")
    outer.createOrReplaceTempView("__o")
    Seq(Some(10), None).toDF("y").createOrReplaceTempView("__s")
    val viaSql = spark.sql("SELECT k FROM __o WHERE x IN (SELECT y FROM __s)")
      .collect().map(_.getInt(0)).toSet
    val ours = Subqueries.in(outer, col("x"), Seq(Some(10), None).toDF("y"))
      .select("k").collect().map(_.getInt(0)).toSet
    assert(ours == viaSql && ours == Set(1))
  }
}
