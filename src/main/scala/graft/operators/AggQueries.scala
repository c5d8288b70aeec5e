package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.expressions.Window

/** Aggregation operators — SURVEY.md §2.4 (A1–A11) and the scalar
  * expression surface §2.2 (P1–P8), re-expressed on the TPC-H-ish
  * testdata. Each query has a DuckDB oracle; money math is decimal-exact
  * (see Exprs).
  *
  * Scale notes: every query is a single groupBy (one shuffle) over a
  * pruned projection; partial aggregation (map-side combine) applies to
  * all of them, and the parquet scan only reads the referenced columns.
  */
object AggQueries extends QueryModule {

  // A1/A3/P1: TPC-H Q1-style pricing summary. Filter + groupBy + exact sums.
  private val a1 = Q(
    "q_a1_agg_pricing",
    "A1/A3/P1 grouped aggregation with exact decimal sums (ref consensus_sequence.sql:140-167 style rollups)",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec2(col("l_quantity"))), 2).cast(DoubleType).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec4(col("l_discount")))), 2)
            .cast(DoubleType).as("sum_disc_price"),
          exactAvg(col("l_quantity")).as("avg_qty"),
          cnt.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS DOUBLE) AS avg_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // A2: conditional aggregation / pivot-style wide counters
  // (ref b117_analysis.sql:52-60 8-way contingency, quality_control.sql:31-44).
  private val a2 = Q(
    "q_a2_conditional_agg",
    "A2 sum(case when) pivot-style counters (ref b117_analysis.sql:52-60)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_orderpriority"))
        .agg(
          oneIf(col("o_orderstatus") === "F").as("n_finished"),
          oneIf(col("o_orderstatus") === "O").as("n_open"),
          oneIf(col("o_totalprice") > 150000).as("n_big"),
          oneIf(col("o_orderstatus") === "F" && col("o_totalprice") > 150000).as("n_big_finished"),
          cnt.as("n_total"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        CAST(sum(CASE WHEN o_orderstatus = 'F' AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_finished,
        count(*) AS n_total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // P2/P3: case-when ladder bucketing + coalesce recode
  // (ref init.sql:786-867 age-group/Grossregion recodes).
  private val p2 = Q(
    "q_p2_case_when_buckets",
    "P2/P3 case-when bucket ladder + recode (ref init.sql:786-867)",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .withColumn("segment",
          when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), "industrial")
            .when(col("c_mktsegment") === "BUILDING", "construction")
            .otherwise("other"))
        .groupBy(col("bal_bucket"), col("segment"))
        .agg(cnt.as("n"))
        .orderBy(col("bal_bucket"), col("segment"))
    },
    Some("""
      SELECT
        CASE WHEN c_acctbal < 0 THEN 'negative'
             WHEN c_acctbal < 1000 THEN 'low'
             WHEN c_acctbal < 5000 THEN 'mid'
             ELSE 'high' END AS bal_bucket,
        CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 'industrial'
             WHEN c_mktsegment = 'BUILDING' THEN 'construction'
             ELSE 'other' END AS segment,
        count(*) AS n
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""))

  // P4: string functions (ref viollier_plate.sql:29-54 name decomposition).
  private val p4 = Q(
    "q_p4_string_funcs",
    "P4 substring/split/length/concat/case transforms (ref viollier_plate.sql:29-54)",
    (s, d) => {
      val p = Tables.part(s, d)
      p.select(
          col("p_partkey"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          upper(col("p_brand")).as("brand_upper"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          substring(col("p_type"), 1, 3).as("type_prefix"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
        split_part(p_name, ' ', 1) AS first_word,
        upper(p_brand) AS brand_upper,
        length(p_name) AS name_len,
        p_brand || ':' || p_type AS brand_type,
        substring(p_type, 1, 3) AS type_prefix
      FROM part ORDER BY p_partkey"""))

  // P5: regex extract / rlike (ref EthzParser.java:9-31 ethid regex,
  // pubmed lineage-mention extraction).
  private val p5 = Q(
    "q_p5_regex_extract",
    "P5 regexp_extract + rlike filter (ref EthzParser.java:9-31)",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_name").rlike("^Customer#[0-9]+$"))
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#0*([0-9]+)", 1).cast(LongType).as("name_id"),
          regexp_replace(col("c_name"), "[0-9]", "").as("name_stripped"))
        .filter(pmod(col("name_id"), lit(7)) === 0)
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey,
        CAST(regexp_extract(c_name, 'Customer#0*([0-9]+)', 1) AS BIGINT) AS name_id,
        regexp_replace(c_name, '[0-9]', '', 'g') AS name_stripped
      FROM customer
      WHERE regexp_matches(c_name, '^Customer#[0-9]+$')
        AND CAST(regexp_extract(c_name, 'Customer#0*([0-9]+)', 1) AS BIGINT) % 7 = 0
      ORDER BY c_custkey"""))

  // P6: date parts incl. the reference's mixed calendar-year + ISO-week
  // rollup (ref gisaid.sql:47-55, 74-87 — week 53 wrap acknowledged there).
  private val p6 = Q(
    "q_p6_dates_weekly",
    "P6 year/month/isoweek extraction + datediff (ref gisaid.sql:47-87)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(
          year(col("o_orderdate")).cast(LongType).as("order_year"),
          month(col("o_orderdate")).cast(LongType).as("order_month"),
          weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"))
        .agg(cnt.as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(col("order_year"), col("order_month"), col("iso_week"))
    },
    Some("""
      SELECT year(o_orderdate) AS order_year,
             month(o_orderdate) AS order_month,
             weekofyear(o_orderdate) AS iso_week,
             count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // P7/P8: math + casts (ref consensus_sequence.sql:164 coverage %,
  // viollier_test.sql:94 modulo interleave).
  private val p7 = Q(
    "q_p7_math_mod",
    "P7/P8 round/ceil/least/pmod/cast (ref viollier_test.sql:93-95)",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(pmod(col("l_orderkey"), lit(7)).cast(LongType).as("key_mod"))
        .agg(
          cnt.as("n"),
          round(sum(dec4(col("l_discount")) * dec2(col("l_quantity"))), 2).cast(DoubleType).as("disc_qty"),
          sum(ceil(col("l_extendedprice")).cast(LongType)).as("sum_ceil_price"),
          round(sum(least(dec4(col("l_discount")), dec4(col("l_tax")))), 4).cast(DoubleType).as("sum_least_rate"))
        .orderBy(col("key_mod"))
    },
    Some("""
      SELECT l_orderkey % 7 AS key_mod,
        count(*) AS n,
        CAST(round(sum(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS disc_qty,
        CAST(sum(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil_price,
        CAST(round(sum(least(CAST(l_discount AS DECIMAL(18,4)), CAST(l_tax AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_least_rate
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // A4: ordered/distinct string_agg (ref consensus_sequence.sql:7 mutation
  // list, gisaid.sql:3). Deterministic: sort the collected set.
  private val a4 = Q(
    "q_a4_string_agg",
    "A4 string_agg with distinct + order (ref consensus_sequence.sql:7)",
    (s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          concat_ws(";", array_sort(collect_set(col("n_name")))).as("nations"),
          // conditional string_agg (ref viollier_plate.sql:202-205):
          // collect_list drops the nulls the `when` produces
          concat_ws(";", array_sort(collect_list(when(col("n_name") < "M", col("n_name")))))
            .as("early_nations"),
          // string_agg ordered by a DIFFERENT key (ref
          // fgcz_pacbio_experiment.sql:86-88): sort structs by the key,
          // then project the value
          concat_ws(";", transform(
            array_sort(collect_list(struct(col("n_nationkey").as("k"), col("n_name").as("v")))),
            x => x.getField("v"))).as("nations_by_key"),
          cnt.as("n_nations"))
        .orderBy(col("r_name"))
    },
    Some("""
      SELECT r_name,
             string_agg(DISTINCT n_name, ';' ORDER BY n_name) AS nations,
             coalesce(string_agg(CASE WHEN n_name < 'M' THEN n_name END, ';' ORDER BY n_name), '') AS early_nations,
             string_agg(n_name, ';' ORDER BY n_nationkey) AS nations_by_key,
             count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  // A5: group by rollup (ref quality_control.sql:78-83,
  // spectrum/sequences_gisaid_api_based.sql:415-427 3-col rollup).
  private val a5 = Q(
    "q_a5_rollup",
    "A5 group by rollup with subtotal rows (ref spectrum matview :415-427)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(cnt.as("n_customers"), moneySum(col("c_acctbal")).as("sum_bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("n_customers"), col("sum_bal"))
        .orderBy(col("region_name"), col("nation_name"))
    },
    Some("""
      SELECT coalesce(r_name, 'ALL') AS region_name,
             coalesce(n_name, 'ALL') AS nation_name,
             count(*) AS n_customers,
             CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY 1, 2"""))

  // A6: having incl. threshold (ref viollier_test.sql:13-30 dup detection,
  // gisaid.sql:114 80% threshold).
  private val a6 = Q(
    "q_a6_having_threshold",
    "A6 having count threshold — duplicate detection (ref viollier_test.sql:13-30)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_custkey"))
        .agg(cnt.as("n_orders"), moneySum(col("o_totalprice")).as("total_spend"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey"""))

  // A7: percentile_cont median (ref spectrum/usage_statistics.sql:53-66).
  private val a7 = Q(
    "q_a7_percentile_median",
    "A7 percentile_cont(0.5) median (ref usage_statistics.sql:53-66)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).cast(DoubleType).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).cast(DoubleType).as("p90_price"),
          cnt.as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 2) AS DOUBLE) AS median_price,
        CAST(round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 2) AS DOUBLE) AS p90_price,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // A8: multi-stage funnel — one pass with conditional flags instead of
  // the reference's 7 CTEs (ref consensus_sequence.sql:174-269).
  private val a8 = Q(
    "q_a8_funnel",
    "A8 funnel: per-order stage flags aggregated monthly in one pass (ref consensus_sequence.sql:174-269)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(
          cnt.as("n_lines"),
          oneIf(col("l_returnflag") === "R").as("n_returned"),
          max(col("l_shipdate")).as("last_ship"))
      o.join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(
          year(col("o_orderdate")).cast(LongType).as("order_year"),
          month(col("o_orderdate")).cast(LongType).as("order_month"))
        .agg(
          cnt.as("placed"),
          oneIf(col("n_lines").isNotNull).as("with_lines"),
          oneIf(col("n_returned") > 0).as("with_returns"),
          oneIf(col("last_ship") > col("o_orderdate")).as("shipped_after_order"))
        .orderBy(col("order_year"), col("order_month"))
    },
    Some("""
      WITH per_order AS (
        SELECT l_orderkey, count(*) AS n_lines,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
               max(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey)
      SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
             count(*) AS placed,
             CAST(sum(CASE WHEN n_lines IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_lines,
             CAST(sum(CASE WHEN n_returned > 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_returns,
             CAST(sum(CASE WHEN last_ship > o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS shipped_after_order
      FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // A9: ratio-to-total via window over exact decimal sums
  // (ref close_country_analysis.sql:68-91 monthly proportions).
  private val a9 = Q(
    "q_a9_ratio_to_total",
    "A9 share-of-total via window sum (ref close_country_analysis.sql:68-91)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val monthly = o.groupBy(
          year(col("o_orderdate")).cast(LongType).as("order_year"),
          col("o_orderpriority"))
        .agg(sum(dec2(col("o_totalprice"))).as("rev_dec"))
      val w = Window.partitionBy(col("order_year"))
      monthly
        .withColumn("year_total", sum(col("rev_dec")).over(w))
        .select(
          col("order_year"), col("o_orderpriority"),
          round(col("rev_dec"), 2).cast(DoubleType).as("revenue"),
          (col("rev_dec").cast(DoubleType) / col("year_total").cast(DoubleType)).as("share"))
        .orderBy(col("order_year"), col("o_orderpriority"))
    },
    Some("""
      WITH yearly AS (
        SELECT year(o_orderdate) AS order_year, o_orderpriority,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders GROUP BY 1, 2)
      SELECT order_year, o_orderpriority,
             CAST(round(rev_dec, 2) AS DOUBLE) AS revenue,
             CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER (PARTITION BY order_year) AS DOUBLE) AS share
      FROM yearly ORDER BY 1, 2"""))

  // A10: grouped "first()"-style dedup collapse. Spark's first() is
  // order-dependent; min_by gives the deterministic equivalent of the
  // reference's summarize(first(...)) (ref import_viollier_test_data.R).
  private val a10 = Q(
    "q_a10_grouped_first",
    "A10 grouped first-value collapse via min_by (ref import_viollier_test_data.R)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_custkey"))
        .agg(
          expr("min_by(o_orderstatus, o_orderkey)").as("first_status"),
          expr("min_by(o_orderpriority, o_orderkey)").as("first_priority"),
          min(col("o_orderkey")).as("first_orderkey"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey,
             arg_min(o_orderstatus, o_orderkey) AS first_status,
             arg_min(o_orderpriority, o_orderkey) AS first_priority,
             min(o_orderkey) AS first_orderkey
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  // A11: character histogram via explode of single-char split
  // (ref gisaid.sql:160-166 base-frequency histogram over genomes).
  private val a11 = Q(
    "q_a11_char_histogram",
    "A11 char-frequency histogram via explode(split(text,'')) (ref gisaid.sql:160-166)",
    (s, d) => {
      val doc = Tables.documents(s, d)
      doc.select(explode(split(upper(col("text")), "")).as("ch"))
        .filter(col("ch") =!= "" && col("ch") =!= " ")
        .groupBy(col("ch"))
        .agg(cnt.as("n"))
        .orderBy(col("ch"))
    },
    Some("""
      SELECT ch, count(*) AS n FROM (
        SELECT unnest(regexp_split_to_array(upper(text), '')) AS ch FROM documents)
      WHERE ch <> '' AND ch <> ' '
      GROUP BY ch ORDER BY ch"""))

  // A12: CUBE — all 2^n grouping-set combinations (rollup's superset;
  // the cross-tab totals report shape). grouping_id disambiguates a
  // REAL null key from a cube subtotal row (same bitmask contract in
  // both engines: Spark grouping_id() == DuckDB GROUPING(a, b)).
  private val a12 = Q(
    "q_a12_cube",
    "A12 cube over (returnflag, linestatus) with grouping_id-tagged subtotal rows",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast(LongType).as("gid"),
          cnt.as("n"), sum(col("l_quantity")).cast(LongType).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus"))
    },
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             count(*) AS n,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus"""))

  // A13: true RelationalGroupedDataset.pivot — the wide cross-tab a2
  // hand-writes as CASE counters, expressed through the dedicated API
  // with EXPLICIT pivot values (the scale-safe form: no
  // distinct-values collect, fixed output schema, still one two-phase
  // aggregate). The oracle is the conditional-aggregation definition
  // of pivot, so the gate pins the API to its semantics.
  private val a13 = Q(
    "q_a13_pivot",
    "A13 pivot: per-returnflag cross-tab of linestatus quantities (explicit values)",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")).cast(LongType))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("qty_f"),
          coalesce(col("O"), lit(0L)).as("qty_o"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             coalesce(CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS BIGINT), 0) AS qty_f,
             coalesce(CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS BIGINT), 0) AS qty_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // G7: unpivot/melt — wide columns to (key, attr, value) long form,
  // the inverse of a13 and the standard feature-table normalization.
  // Map-side only (each row emits one row per measure, no shuffle
  // before the ORDER BY); the oracle is the UNION-ALL-per-column
  // semantic definition.
  private val g7 = Q(
    "q_g7_unpivot",
    "G7 unpivot: customer measures melted to (key, attr, value) long form",
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          col("c_nationkey").cast(LongType).as("nationkey"),
          length(col("c_name")).cast(LongType).as("name_len"))
      c.unpivot(Array(col("c_custkey")),
          Array(col("nationkey"), col("name_len")), "attr", "val")
        .orderBy(col("c_custkey"), col("attr"))
    },
    Some("""
      SELECT c_custkey, attr, val FROM (
        SELECT c_custkey, 'nationkey' AS attr, CAST(c_nationkey AS BIGINT) AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'name_len', CAST(length(c_name) AS BIGINT) FROM customer)
      ORDER BY c_custkey, attr"""))

  // A14: explicit GROUPING SETS — the general form a5's ROLLUP and
  // a12's CUBE specialize; grouping() flags disambiguate a real NULL
  // key from a superaggregate row (the reason the flags exist), and
  // both engines must agree on flag values and on which sets appear.
  // Same two-phase expand+aggregate shape as ROLLUP at scale.
  private val a14 = Q(
    "q_a14_grouping_sets",
    "A14 grouping sets: ((rf, ls), (rf), ()) with grouping() markers",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
          grouping(col("l_linestatus")).cast(LongType).as("g_ls"),
          count(lit(1)).cast(LongType).as("n"),
          sum(floor(col("l_quantity")).cast(LongType)).cast(LongType).as("sq"))
        .select(coalesce(col("l_returnflag"), lit("<ALL>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<ALL>")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sq"))
        .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))
    },
    Some("""
      SELECT coalesce(l_returnflag, '<ALL>') AS rf,
             coalesce(l_linestatus, '<ALL>') AS ls,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sq
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_rf, g_ls, rf, ls"""))

  override val all: Seq[Q] =
    Seq(a1, a2, p2, p4, p5, p6, p7, a4, a5, a6, a7, a8, a9, a10, a11, a12,
      a13, a14, g7)
}
