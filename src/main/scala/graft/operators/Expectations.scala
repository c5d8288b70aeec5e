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
        coalesce(sum(col("__n")), lit(0L)).cast(LongType).as("total"))
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

  /** Per-column slice statistics off ONE scan: (column_name, n_rows,
    * n_null, n_distinct). Exact distincts are affordable at gate
    * scale; at 100 TB substitute the KMV sketch column (sp5's profile
    * form) — the drift math below is unchanged. */
  def sliceStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(lit(1)).cast(LongType).as(s"${c}__n"),
      count(when(col(c).isNull, 1)).cast(LongType).as(s"${c}__nulls"),
      countDistinct(col(c)).cast(LongType).as(s"${c}__nd")))
    val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    cols.map(c => one.select(lit(c).as("column_name"),
        col(s"${c}__n").as("n_rows"), col(s"${c}__nulls").as("n_null"),
        col(s"${c}__nd").as("n_distinct")))
      .reduce(_ unionByName _)
  }

  /** Profile drift between a baseline and a current slice: one long
    * row per (column, metric) with the integer relative drift in ppm —
    * the data-drift monitor that catches a feed going quiet, a column
    * going null, or cardinality collapsing, BEFORE a model trains on
    * it. Pure column math over O(#cols) rows. */
  def drift(baseline: DataFrame, current: DataFrame): DataFrame = {
    val b = baseline.select(col("column_name"), col("n_rows").as("b_n_rows"),
      col("n_null").as("b_n_null"), col("n_distinct").as("b_n_distinct"))
    val joined = b.join(current, Seq("column_name"))
    Seq("n_rows", "n_null", "n_distinct").map { m =>
      joined.select(col("column_name"), lit(m).as("metric"),
        col(s"b_$m").as("baseline"), col(m).as("current"),
        expr(s"(1000000 * abs($m - b_$m)) div greatest(b_$m, 1)").as("drift_ppm"))
    }.reduce(_ unionByName _)
  }
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

  // Profile drift across the events table's two time halves — the
  // temporal data-drift monitor (does the second half of the month
  // still look like the first?). Integer relative drift in ppm over
  // exact per-slice stats; both engines replay the same split and the
  // same metric math.
  private val qa2 = {
    val splitTs = "2024-01-16 00:00:00"
    val cols = Seq("user_id", "event_type", "value")
    Q(
      "q_qa2_profile_drift",
      "profile drift monitor: per-column n_rows/n_null/n_distinct drift (ppm) across time halves",
      (s, d) => {
        val ev = Tables.events(s, d)
        val base = Expectations.sliceStats(
          ev.filter(col("ts") < lit(splitTs).cast("timestamp")), cols)
        val cur = Expectations.sliceStats(
          ev.filter(col("ts") >= lit(splitTs).cast("timestamp")), cols)
        Expectations.drift(base, cur)
          .orderBy(col("column_name"), col("metric"))
      },
      Some {
        def stats(alias: String, pred: String) = s"""
          $alias AS (
            ${cols.map(c => s"""SELECT '$c' AS column_name,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_null,
                 CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
               FROM events WHERE $pred""").mkString("\n            UNION ALL\n            ")})"""
        s"""
        WITH ${stats("b", s"ts < TIMESTAMP '$splitTs'")},
        ${stats("c", s"ts >= TIMESTAMP '$splitTs'")},
        j AS (SELECT b.column_name, b.n_rows AS b_n_rows, b.n_null AS b_n_null,
                     b.n_distinct AS b_n_distinct, c.n_rows, c.n_null, c.n_distinct
              FROM b JOIN c ON c.column_name = b.column_name)
        SELECT column_name, metric, baseline, current, drift_ppm FROM (
          SELECT column_name, 'n_rows' AS metric, b_n_rows AS baseline, n_rows AS current,
                 (1000000 * abs(n_rows - b_n_rows)) // greatest(b_n_rows, 1) AS drift_ppm FROM j
          UNION ALL
          SELECT column_name, 'n_null', b_n_null, n_null,
                 (1000000 * abs(n_null - b_n_null)) // greatest(b_n_null, 1) FROM j
          UNION ALL
          SELECT column_name, 'n_distinct', b_n_distinct, n_distinct,
                 (1000000 * abs(n_distinct - b_n_distinct)) // greatest(b_n_distinct, 1) FROM j)
        ORDER BY column_name, metric"""
      })
  }

  override val all: Seq[graft.Q] = Seq(qa1, qa2)
}
