package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.expressions.Window

/** Window / sort / set / generator operators — SURVEY.md §2.5–§2.8.
  * Window sorts use explicit deterministic tie-break keys where the
  * reference relied on arbitrary row order (documented divergence,
  * SURVEY §7.4.1).
  */
object WindowSetQueries extends QueryModule {

  // W1: global id assignment `<base> + row_number()` (ref viollier_test.sql:34-47
  // new-ETHID allocation). Deterministic order instead of arbitrary.
  private val w1 = Q(
    "q_w1_row_number_global",
    "W1 global row_number id allocation with deterministic order (ref viollier_test.sql:34-47)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      c.filter(col("c_acctbal") > 9000)
        .withColumn("new_id", (lit(1000000L) + row_number().over(w)).cast(LongType))
        .select(col("c_custkey"), col("new_id"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, 1000000 + row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS new_id
      FROM customer WHERE c_acctbal > 9000 ORDER BY c_custkey"""))

  // W2/W3: partitioned priority pick — boolean-priority ordering inside the
  // window (ref viollier_test.sql:74,149,214 prefer %eg% plates).
  private val w2 = Q(
    "q_w2_partitioned_rank",
    "W2/W3 top-3-per-group by boolean priority then measure (ref viollier_test.sql:74)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_mktsegment").like("%AUTO%").desc, col("c_acctbal").desc, col("c_custkey").asc)
      c.withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey").cast(LongType).as("c_nationkey"), col("rn"), col("c_custkey"))
        .orderBy(col("c_nationkey"), col("rn"))
    },
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, rn, c_custkey FROM (
        SELECT c_nationkey, c_custkey,
               row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY (c_mktsegment LIKE '%AUTO%') DESC, c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer)
      WHERE rn <= 3 ORDER BY c_nationkey, rn"""))

  // W4: duplicate index within group — rows beyond the first are "less
  // complete duplicates" (ref export_spsp_submission.R:244-263).
  private val w4 = Q(
    "q_w4_duplicate_index",
    "W4 duplicate_idx within (custkey,status) group, keep dups only (ref export_spsp_submission.R:244-263)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("duplicate_idx", row_number().over(w).cast(LongType))
        .filter(col("duplicate_idx") > 1)
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderkey"), col("duplicate_idx"))
        .orderBy(col("o_custkey"), col("o_orderstatus"), col("duplicate_idx"))
    },
    Some("""
      SELECT o_custkey, o_orderstatus, o_orderkey, duplicate_idx FROM (
        SELECT o_custkey, o_orderstatus, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS duplicate_idx
        FROM orders)
      WHERE duplicate_idx > 1 ORDER BY o_custkey, o_orderstatus, duplicate_idx"""))

  // O2: multi-boolean priority ordering (ref viollier_test.sql:286-291).
  private val o2 = Q(
    "q_o2_priority_order",
    "O2 boolean-priority ordering + limit (ref viollier_test.sql:286-291)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.orderBy(
          (col("o_orderstatus") === "F").desc,
          col("o_orderpriority").like("1%").desc,
          col("o_totalprice").desc,
          col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          dec2(col("o_totalprice")).cast(DoubleType).as("o_totalprice"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
      FROM orders
      ORDER BY (o_orderstatus = 'F') DESC, (o_orderpriority LIKE '1%') DESC,
               o_totalprice DESC, o_orderkey ASC
      LIMIT 100"""))

  // O3/O5: ranking by count desc + top-k (ref gisaid.sql:1-43 rankings).
  private val o3 = Q(
    "q_o3_topk_ranking",
    "O3/O5 order-by-count ranking, top 10 (ref gisaid.sql:1-43)",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_custkey"))
        .agg(cnt.as("n_orders"), moneySum(col("o_totalprice")).as("spend"))
        .orderBy(col("n_orders").desc, col("o_custkey").asc)
        .limit(10)
    },
    Some("""
      SELECT o_custkey, count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
      ORDER BY n_orders DESC, o_custkey ASC LIMIT 10"""))

  // U1: union all with null-padded branch (ref init.sql:881-901
  // dashboard cases ∪ negatives).
  private val u1 = Q(
    "q_u1_union_all_padded",
    "U1 union all of two branches, missing cols null-padded (ref init.sql:881-901)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val a = o.select(
        to_date(col("o_orderdate")).as("day"),
        lit("order").as("kind"),
        dec2(col("o_totalprice")).as("amount_dec"),
        col("o_orderpriority").as("detail"))
      val b = li.select(
        to_date(col("l_shipdate")).as("day"),
        lit("ship").as("kind"),
        dec2(col("l_extendedprice")).as("amount_dec"),
        lit(null).cast("string").as("detail"))
      a.unionByName(b)
        .groupBy(year(col("day")).cast(LongType).as("yr"), col("kind"),
          coalesce(col("detail"), lit("none")).as("detail"))
        .agg(cnt.as("n"), round(sum(col("amount_dec")), 2).cast(DoubleType).as("amount"))
        .orderBy(col("yr"), col("kind"), col("detail"))
    },
    Some("""
      WITH u AS (
        SELECT CAST(o_orderdate AS DATE) AS day, 'order' AS kind,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amount_dec, o_orderpriority AS detail
        FROM orders
        UNION ALL
        SELECT CAST(l_shipdate AS DATE) AS day, 'ship' AS kind,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS amount_dec, NULL AS detail
        FROM lineitem)
      SELECT year(day) AS yr, kind, coalesce(detail, 'none') AS detail,
             count(*) AS n, CAST(round(sum(amount_dec), 2) AS DOUBLE) AS amount
      FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // U2: union distinct (ref omicron_analysis.sql:22 candidate set).
  private val u2 = Q(
    "q_u2_union_distinct",
    "U2 union distinct of two key sets (ref omicron_analysis.sql:22)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val richCust = c.filter(col("c_acctbal") > 9500).select(col("c_custkey").as("custkey"))
      val bigSpenders = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
      richCust.union(bigSpenders).distinct().orderBy(col("custkey"))
    },
    Some("""
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9500
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      ORDER BY 1"""))

  // G1/G5: explode(split) word expansion (ref gisaid.sql:21-31 author
  // ranking via unnest(string_to_array)).
  private val g1 = Q(
    "q_g1_explode_words",
    "G1 explode(split()) token expansion + ranking (ref gisaid.sql:21-31)",
    (s, d) => {
      val doc = Tables.documents(s, d)
      doc.select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(cnt.as("n"))
        .orderBy(col("n").desc, col("word").asc)
    },
    Some("""
      SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word ORDER BY n DESC, word ASC"""))

  // G3: date spine via sequence() cross join dimension, left join facts
  // (ref spectrum :384-393 sequencing-intensity denominator).
  private val g3 = Q(
    "q_g3_date_spine",
    "G3 generate_series date spine × dim, left join daily counts (ref spectrum :384-393)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val spine = s.range(1)
        .select(explode(expr(
          "sequence(to_date('1995-01-01'), to_date('1995-03-31'), interval 1 day)")).as("d"))
        .select(col("d").cast("timestamp").as("day"))
      val prios = o.select(col("o_orderpriority")).distinct()
      val daily = o.groupBy(date_trunc("DAY", col("o_orderdate")).as("day"), col("o_orderpriority"))
        .agg(cnt.as("n_raw"))
      spine.crossJoin(broadcast(prios))
        .join(daily, Seq("day", "o_orderpriority"), "left")
        .select(col("day"), col("o_orderpriority"),
          coalesce(col("n_raw"), lit(0L)).as("n_orders"))
        .orderBy(col("day"), col("o_orderpriority"))
    },
    Some("""
      WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
      prios AS (SELECT DISTINCT o_orderpriority FROM orders),
      daily AS (
        SELECT date_trunc('day', o_orderdate) AS day, o_orderpriority, count(*) AS n_raw
        FROM orders GROUP BY 1, 2)
      SELECT s.day, p.o_orderpriority, coalesce(d.n_raw, 0) AS n_orders
      FROM spine s CROSS JOIN prios p
      LEFT JOIN daily d ON s.day = d.day AND p.o_orderpriority = d.o_orderpriority
      ORDER BY 1, 2"""))

  // G4: all-regex-matches extraction (ref pubmed_init.sql
  // article_potential_lineage lineage mentions).
  private val g4 = Q(
    "q_g4_regexp_extract_all",
    "G4 explode(regexp_extract_all) (ref pubmed_init.sql lineage mentions)",
    (s, d) => {
      val e = Tables.events(s, d)
      e.select(col("event_type"),
          explode(expr("regexp_extract_all(props, '[0-9]+', 0)")).as("num"))
        .groupBy(col("event_type"), col("num").cast(LongType).as("num"))
        .agg(cnt.as("n"))
        .orderBy(col("event_type"), col("num"))
    },
    Some("""
      SELECT event_type, CAST(num AS BIGINT) AS num, count(*) AS n FROM (
        SELECT event_type, unnest(regexp_extract_all(props, '[0-9]+')) AS num FROM events)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // W5+: VALUE-range frame (RANGE BETWEEN N PRECEDING) — the frame
  // spec ROWS can't express: the frame is defined by the ORDER-BY
  // VALUE distance, so peers (equal keys) always share a frame and
  // gaps shrink it. Integer order key + count/sum aggregates keep it
  // gate-exact; the window stays supplier-partitioned (co-partitioned
  // shuffle, never global).
  private val w6 = {
    import org.apache.spark.sql.expressions.Window
    Q(
      "q_w6_range_frame",
      "value-range window frame: per-supplier trailing-100-orderkey count and quantity",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
          .rangeBetween(-100L, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
          .withColumn("n_in_range", count(lit(1)).over(w))
          .withColumn("qty_in_range", sum(col("l_quantity")).over(w).cast(LongType))
          .select(col("l_suppkey"), col("l_orderkey"), col("n_in_range"),
            col("qty_in_range"))
          .orderBy(col("l_suppkey"), col("l_orderkey"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey,
               count(*) OVER w AS n_in_range,
               CAST(sum(l_quantity) OVER w AS BIGINT) AS qty_in_range
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey
                     RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        ORDER BY l_suppkey, l_orderkey"""))
  }

  // O6 (round 10): the W1 shape's PRODUCTION form as its own gate —
  // Ids.globalRowNumber (range-partition + in-partition sort +
  // zipWithIndex offsets, SCALING.md "global id allocation") must
  // allocate exactly the ids the single-task window form would, so the
  // oracle IS the unpartitioned row_number. numParts=8 forces real
  // multi-partition offset stitching even at sf0.001.
  private val o6 = Q(
    "q_o6_global_ids_partitioned",
    "global id allocation via the partition-offset production form (== unpartitioned row_number)",
    (s, d) => {
      val base = Tables.orders(s, d)
        .filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), col("o_totalprice"))
      Ids.globalRowNumber(base,
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), "gid", numParts = 8)
        .select(col("o_orderkey"), col("gid"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS gid
      FROM orders WHERE o_totalprice > 200000 ORDER BY o_orderkey"""))

  override val all: Seq[Q] =
    Seq(w1, w2, w4, w6, o2, o3, o6, u1, u2, g1, g3, g4)
}
