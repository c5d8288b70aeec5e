package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe renderings of SQL subquery predicates.
  *
  * Spark compiles `x NOT IN (subquery)` to a null-aware anti join —
  * which it can ONLY execute as a broadcast join (the null-aware
  * disjunction `x = v OR isnull(x = v)` defeats hash-join keying, and
  * a non-broadcastable build side fails the query or falls back to
  * BroadcastNestedLoopJoin). At 100 TB an inner side above the
  * broadcast threshold needs the DECOMPOSED form, which is what
  * [[notIn]] implements with plain shuffle-friendly operators:
  *
  *   x NOT IN S  ≡  S is empty
  *                  ∨ (x IS NOT NULL ∧ S has no NULL ∧ x ∉ S≠)
  *
  * (three-valued logic: any NULL in S makes every membership test
  * UNKNOWN, dropping all rows; a NULL x likewise; an EMPTY S keeps
  * every row — even NULL x.) The pieces: a 1-row aggregate of S
  * (count, non-null count) cross-joined (broadcast, 1 row), and an
  * equality left join against DISTINCT S (shuffle-partitioned on the
  * value — no broadcast requirement, no row multiplication).
  * [[SubqueryFuzzSpec]] proves row-for-row equality with Spark's own
  * `NOT IN` compilation, NULLs and empty sets included.
  */
object Subqueries {

  /** Rows of `outer` where `expr NOT IN (sub's single column)`,
    * exact SQL semantics at shuffle-join scale. */
  def notIn(outer: DataFrame, expr: Column, sub: DataFrame): DataFrame = {
    require(sub.columns.length == 1, "subquery side must have exactly one column")
    val v = sub.select(col(sub.columns.head).as("__sq_v")).distinct()
    val stats = sub.agg(count(lit(1)).cast("long").as("__sq_n"),
      count(col(sub.columns.head)).cast("long").as("__sq_nn"))
    outer.join(v, expr === col("__sq_v"), "left")
      .crossJoin(broadcast(stats))
      .filter(col("__sq_n") === 0L ||
        (col("__sq_v").isNull && expr.isNotNull && col("__sq_n") === col("__sq_nn")))
      .drop("__sq_v", "__sq_n", "__sq_nn")
  }

  /** Rows of `outer` where `expr IN (sub's single column)` — a plain
    * equality semi join is already exact for IN (a NULL x matches
    * nothing; NULL elements of S match nothing), kept here so the two
    * membership forms live together. */
  def in(outer: DataFrame, expr: Column, sub: DataFrame): DataFrame = {
    require(sub.columns.length == 1, "subquery side must have exactly one column")
    val v = sub.select(col(sub.columns.head).as("__sq_v"))
    outer.join(v, expr === col("__sq_v"), "left_semi")
  }
}
