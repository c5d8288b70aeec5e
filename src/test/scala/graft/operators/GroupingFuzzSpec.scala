package graft.operators

import graft.SparkSpec

/** The grouping-sets-fuzz in-JVM half: the DataFrame rendering
  * (`rollup`/`cube`/`groupingSets` over PRE-PROJECTED named keys — the
  * aliased-expression-identity constraint documented in
  * [[GroupingFuzz]]) must equal the common-dialect SQL under Spark for
  * every generated query, so the cross-engine gate (q_fz5) isolates
  * Spark-vs-DuckDB semantics, never DF-vs-SQL drift. */
class GroupingFuzzSpec extends SparkSpec {

  test("same seed generates the identical grouping population") {
    val a = GroupingFuzz.queries().map(_.commonSql)
    val b = GroupingFuzz.queries().map(_.commonSql)
    assert(a == b)
    assert(a != GroupingFuzz.queries(seed = 9L).map(_.commonSql))
  }

  test("population exercises the whole multi-level-aggregate surface") {
    val sqls = GroupingFuzz.queries().map(_.commonSql)
    val all = sqls.mkString("\n")
    Seq("ROLLUP(", "CUBE(", "GROUPING SETS (", "grouping_id(", "grouping(",
      "nullif(", "count(DISTINCT", "sum(DISTINCT", "CASE WHEN", "WHERE",
      "count(*)", "min(", "max(").foreach { op =>
      assert(all.contains(op), s"population never generated $op")
    }
    // the divergence class this population exists for: nullable group
    // keys under rollup — a genuine NULL key and a rolled-up row are
    // indistinguishable without the grouping flags
    assert(sqls.exists(q => q.contains("nullif(") &&
      (q.contains("ROLLUP(") || q.contains("CUBE(") || q.contains("GROUPING SETS"))),
      "no nullable grouping key generated")
    // duplicate grouping sets (both engines duplicate the rows) and
    // the empty grand-total set are id-cycled guarantees
    val gsets = sqls.filter(_.contains("GROUPING SETS"))
    assert(gsets.nonEmpty)
    assert(gsets.exists(_.contains("()")), "no empty grouping set generated")
    def setsOf(q: String): Seq[String] = {
      // collect each top-level "(...)" group of the GROUPING SETS list
      val body = q.substring(q.indexOf("GROUPING SETS (") + "GROUPING SETS (".length)
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var depth = 0; var i = 0; var done = false
      while (i < body.length && !done) {
        body(i) match {
          case '(' => depth += 1; cur.append('(')
          case ')' if depth > 0 =>
            depth -= 1; cur.append(')')
            if (depth == 0) { out += cur.toString(); cur.clear() }
          case ')' => done = true // the list's own closing paren
          case ch => if (depth > 0) cur.append(ch)
        }
        i += 1
      }
      out.result()
    }
    assert(gsets.exists(q => { val s = setsOf(q); s.distinct.size < s.size }),
      "no duplicate grouping set generated")
    // every query must project grouping_id over ALL its keys — the
    // only way to tell a rolled-up row from a NULL key
    assert(sqls.forall(_.contains("grouping_id(")), "a query lacks grouping_id")
  }

  test(s"property: all ${GroupingFuzz.NQueries} grouping queries — DataFrame ≡ Spark-SQL") {
    for (t <- Seq("orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    val viaDf = GroupingFuzz.fingerprintAll(spark, sf0001, q => q.df(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaSql = GroupingFuzz.fingerprintAll(spark, sf0001,
        q => spark.sql(q.commonSql))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDf == viaSql)
    assert(viaDf.size == GroupingFuzz.NQueries)
    assert(viaDf.count(_._2 > 0) > GroupingFuzz.NQueries / 2,
      "most queries must return rows — an all-empty population tests nothing")
  }
}
