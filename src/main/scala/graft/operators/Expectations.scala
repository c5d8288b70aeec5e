package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declarative data-quality expectations — the check-suite operator
  * (Deequ-style) for the validation the reference performs ad hoc on
  * every ingest (Viollier receive's header + plausibility checks,
  * `utility.R` range asserts, the import's drift check,
  * `viollier_test.sql:13-30` duplicate detection): each expectation
  * reduces to one `(check, violations, total)` row, and a suite is
  * the union of those rows — a table's health as data, joinable into
  * a JobRunner gate (fail the stage when a criterion is breached, the
  * ImportReport discipline).
  *
  * Scale shape: column checks (null / range) fuse into ONE
  * conditional-count aggregate over a single scan; uniqueness is one
  * two-phase groupBy on the key; referential integrity is one
  * anti-join against the (broadcastable) parent key set. Nothing
  * collects; the report is O(#checks) rows.
  */
object Expectations {

  /** One-scan column checks: each spec is (check-name, violation
    * predicate). Returns one row per check off a single aggregate. */
  def columnChecks(df: DataFrame,
      specs: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val aggs = specs.flatMap { case (name, bad) =>
      Seq(count(when(bad, 1)).cast(LongType).as(s"__v_$name"),
        count(lit(1)).cast(LongType).as(s"__t_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    specs.map { case (name, _) =>
      one.select(lit(name).as("check"),
        col(s"__v_$name").as("violations"), col(s"__t_$name").as("total"))
    }.reduce(_ unionByName _)
  }

  /** Uniqueness: violations = rows participating in a duplicated key
    * (the viollier_test.sql duplicate-detection count). */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("__n"))
    grouped.agg(
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L)).cast(LongType)
          .as("violations"),
        sum(col("__n")).cast(LongType).as("total"))
      .select(lit(name).as("check"), col("violations"), col("total"))
  }

  /** Referential integrity: child keys absent from the parent key
    * set. `broadcastParent = true` (default) suits dimension-sized
    * parents; pass false when the parent is itself a fact table (the
    * anti-join then shuffles on the key — co-locate by bucketing at
    * scale). */
  def foreignKeyCheck(child: DataFrame, childKey: String, name: String,
      parent: DataFrame, parentKey: String,
      broadcastParent: Boolean = true): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
    val orphans = child.select(col(childKey))
      .join(if (broadcastParent) broadcast(pk) else pk, Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast(LongType).as("violations"))
    val total = child.agg(count(lit(1)).cast(LongType).as("total"))
    orphans.crossJoin(total)
      .select(lit(name).as("check"), col("violations"), col("total"))
  }

  /** A suite is just the union of check rows. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}

/** The expectations gate: a mixed suite over lineitem/part/events
  * with both PASSING and genuinely FAILING checks — the synthetic
  * lineitem carries duplicate (orderkey, linenumber) pairs (the fact
  * the round-8 fuzz surfaced) and events carries null user_ids, so
  * the report proves violations are counted, not just zeros. */
object ExpectationsQueries extends graft.QueryModule {
  import graft.{Q, Tables}

  private val qa1 = Q(
    "q_qa1_expectations",
    "data-quality expectation suite: null/range one-scan, uniqueness, FK integrity",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ev = Tables.events(s, d)
      Expectations.suite(Seq(
        Expectations.columnChecks(li, Seq(
          ("lineitem_not_null_orderkey", col("l_orderkey").isNull),
          ("lineitem_range_quantity",
            col("l_quantity") < 1 || col("l_quantity") > 50))),
        Expectations.uniqueCheck(li, "lineitem_unique_orderkey_linenumber",
          Seq("l_orderkey", "l_linenumber")),
        Expectations.foreignKeyCheck(li, "l_partkey", "lineitem_fk_partkey",
          Tables.part(s, d), "p_partkey"),
        Expectations.columnChecks(ev, Seq(
          ("events_not_null_user_id", col("user_id").isNull)))))
        .select(col("check").as("check_name"), col("violations"), col("total"))
        .orderBy(col("check_name"))
    },
    Some("""
      SELECT check_name, violations, total FROM (
        SELECT 'lineitem_not_null_orderkey' AS check_name,
               CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS violations,
               CAST(count(*) AS BIGINT) AS total
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_range_quantity',
               CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_unique_orderkey_linenumber',
               CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT),
               CAST(sum(n) AS BIGINT)
        FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)
        UNION ALL
        SELECT 'lineitem_fk_partkey',
               CAST(count(CASE WHEN p.p_partkey IS NULL THEN 1 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
          ON p.p_partkey = l.l_partkey
        UNION ALL
        SELECT 'events_not_null_user_id',
               CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM events)
      ORDER BY check_name"""))

  override val all: Seq[graft.Q] = Seq(qa1)
}
