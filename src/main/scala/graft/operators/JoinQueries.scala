package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.expressions.Window

/** Join operators — SURVEY.md §2.3 (J1–J12). Dimension tables (region,
  * nation, inline lookups) are explicitly broadcast; fact-fact joins
  * shuffle on their keys and rely on AQE for skew. The reference's
  * correlated `not exists` best-per-group dedup (J6) is re-expressed as
  * a window rank — semantically equal and one shuffle cheaper.
  */
object JoinQueries extends QueryModule {

  // J1: multi-way inner equi-join chain with broadcast dims
  // (ref consensus_sequence.sql:80-84, sample_status.sql:44-57).
  private val j1 = Q(
    "q_j1_join_multiway",
    "J1 5-way inner join, dims broadcast (ref consensus_sequence.sql:80-84)",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec4(col("l_discount")))), 2)
            .cast(DoubleType).as("revenue"),
          cnt.as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""
      SELECT r_name, n_name,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  // J2: left outer enrichment (ref bag_sequence_report.sql:36-51).
  private val j2 = Q(
    "q_j2_join_left_enrich",
    "J2 left outer join keeping unmatched left rows (ref bag_sequence_report.sql:36-51)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val agg = o.groupBy(col("o_custkey"))
        .agg(cnt.as("n_orders"), sum(dec2(col("o_totalprice"))).as("spend_dec"))
      c.join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("spend_dec"), lit(0).cast("decimal(18,2)")), 2).cast(DoubleType).as("spend"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             coalesce(n_orders, 0) AS n_orders,
             CAST(round(coalesce(spend_dec, CAST(0 AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
      FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
        FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
      ORDER BY c_custkey"""))

  // J4: full outer join of two daily aggregates
  // (ref gisaid.sql:80-87 sequenced-vs-positive per week).
  private val j4 = Q(
    "q_j4_join_full_outer",
    "J4 full outer join of two daily rollups (ref gisaid.sql:80-87)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val ordersDaily = o.groupBy(date_trunc("DAY", col("o_orderdate")).as("day"))
        .agg(cnt.as("n_orders"))
      val shipsDaily = li.groupBy(date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(cnt.as("n_ships"))
      ordersDaily.join(shipsDaily, Seq("day"), "full")
        .select(
          col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"))
        .orderBy(col("day"))
    },
    Some("""
      SELECT coalesce(o.day, s.day) AS day,
             coalesce(n_orders, 0) AS n_orders,
             coalesce(n_ships, 0) AS n_ships
      FROM (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders FROM orders GROUP BY 1) o
      FULL OUTER JOIN (SELECT date_trunc('day', l_shipdate) AS day, count(*) AS n_ships FROM lineitem GROUP BY 1) s
        ON o.day = s.day
      ORDER BY 1"""))

  // J3: right outer (ref fgcz_pacbio_experiment.sql:76-78, 91-93).
  private val j3 = Q(
    "q_j3_join_right_outer",
    "J3 right outer join keeping unmatched right rows (ref fgcz_pacbio_experiment.sql:76-78)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.filter(col("o_totalprice") > 350000)
        .join(c, col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(
          oneIf(col("o_orderkey").isNotNull).as("n_big_orders"),
          cnt.as("n_rows"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey,
             CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_big_orders,
             count(*) AS n_rows
      FROM (SELECT * FROM orders WHERE o_totalprice > 350000) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  // J5: left semi = EXISTS (ref spectrum :49-55, app.sql:46-50).
  private val j5 = Q(
    "q_j5_semi_join",
    "J5 left-semi join / EXISTS (ref sequences_gisaid_api_based.sql:49-55)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o.filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      ORDER BY c_custkey"""))

  // J6: left anti = NOT EXISTS (ref NucleotideMutationImporter.java:103-110
  // pending-work scans).
  private val j6 = Q(
    "q_j6_anti_join",
    "J6 left-anti join / NOT EXISTS (ref quality_control.sql:47-53)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"), dec2(col("c_acctbal")).cast(DoubleType).as("acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  // J6b: the reference's correlated double-not-exists best-per-group dedup
  // (ref spectrum :60-77 min number_n per ethid, tie-break by name),
  // re-expressed as a window rank — same semantics, one pass.
  private val j6b = Q(
    "q_j6_best_per_group",
    "J6 best-record-per-group dedup via window rank replacing correlated NOT EXISTS (ref spectrum :60-77)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), dec2(col("o_totalprice")).cast(DoubleType).as("best_price"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS best_price
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
      WHERE rn = 1 ORDER BY o_custkey"""))

  // J7: cross join against a tiny broadcast definition table
  // (ref consensus_sequence.sql:58-61 sequence × variant-definition).
  private val j7 = Q(
    "q_j7_cross_join",
    "J7 cross join with tiny broadcast side (ref consensus_sequence.sql:58-61)",
    (s, d) => {
      val r = Tables.region(s, d)
      val o = Tables.orders(s, d)
      val statuses = o.select(col("o_orderstatus")).distinct()
      r.crossJoin(broadcast(statuses))
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    },
    Some("""
      SELECT r_name, o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      ORDER BY r_name, o_orderstatus"""))

  // J9/J10: join on computed expression + composite secondary condition
  // (ref gisaid.sql:2-8 lower(lab) join; viollier_plate.sql:210-211).
  private val j9 = Q(
    "q_j9_join_on_expr",
    "J9/J10 join on computed expr + secondary range condition (ref gisaid.sql:2-8)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o,
          col("c_custkey") === col("o_custkey") &&
          year(col("o_orderdate")) === 1996 &&
          upper(col("c_mktsegment")) === lit("BUILDING"))
        .groupBy(col("c_custkey"))
        .agg(cnt.as("n_1996_orders"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, count(*) AS n_1996_orders
      FROM customer JOIN orders
        ON c_custkey = o_custkey
       AND year(o_orderdate) = 1996
       AND upper(c_mktsegment) = 'BUILDING'
      GROUP BY c_custkey ORDER BY c_custkey"""))

  // J11: VALUES-list inline lookup join (ref viollier_test.sql:100-112).
  private val j11 = Q(
    "q_j11_values_lookup",
    "J11 inline VALUES lookup-table join (ref viollier_test.sql:100-112)",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val lookup = Seq(
        ("1-URGENT", 1L), ("2-HIGH", 2L), ("3-MEDIUM", 3L),
        ("4-NOT SPECIFIED", 4L), ("5-LOW", 5L))
        .toDF("prio_name", "prio_rank")
      o.join(broadcast(lookup), col("o_orderpriority") === col("prio_name"))
        .groupBy(col("prio_rank"))
        .agg(cnt.as("n_orders"))
        .orderBy(col("prio_rank"))
    },
    Some("""
      SELECT prio_rank, count(*) AS n_orders
      FROM orders JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                               ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) AS l(prio_name, prio_rank)
        ON o_orderpriority = prio_name
      GROUP BY prio_rank ORDER BY prio_rank"""))

  // J12: coalescing full-join merge, prefer-left fill-from-right
  // (ref database/R/utility.R:324-357 sequence_identifier merge).
  private val j12 = Q(
    "q_j12_coalescing_join",
    "J12 coalescing full-outer merge of two yearly aggregates (ref utility.R:324-357)",
    (s, d) => {
      val o = Tables.orders(s, d)
      def spend(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey"))
        .agg(sum(dec2(col("o_totalprice"))).as(s"dec_$yr"), cnt.as(s"n_$yr"))
      spend(1995).join(spend(1996), Seq("o_custkey"), "full")
        .select(
          col("o_custkey"),
          round(coalesce(col("dec_1995"), lit(0).cast("decimal(18,2)")), 2).cast(DoubleType).as("spend_1995"),
          round(coalesce(col("dec_1996"), lit(0).cast("decimal(18,2)")), 2).cast(DoubleType).as("spend_1996"),
          coalesce(col("n_1995"), lit(0L)).as("n_1995"),
          coalesce(col("n_1996"), lit(0L)).as("n_1996"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH y95 AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS dec_1995, count(*) AS n_1995
                   FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
           y96 AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS dec_1996, count(*) AS n_1996
                   FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
      SELECT coalesce(y95.o_custkey, y96.o_custkey) AS o_custkey,
             CAST(round(coalesce(dec_1995, CAST(0 AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend_1995,
             CAST(round(coalesce(dec_1996, CAST(0 AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend_1996,
             coalesce(n_1995, 0) AS n_1995,
             coalesce(n_1996, 0) AS n_1996
      FROM y95 FULL OUTER JOIN y96 ON y95.o_custkey = y96.o_custkey
      ORDER BY 1"""))

  // Blocked fuzzy self-join (entity resolution): edit-distance-1 name
  // pairs found WITHOUT the O(N²) all-pairs compare. Blocking =
  // wildcard variants (each name emits L copies with one tail
  // position replaced by '_'; two names share a variant iff they
  // differ in at most that position — the SymSpell/spell-correction
  // neighborhood trick; on fixed-length ids, levenshtein 1 ≡ Hamming
  // 1, so the blocking is EXACT, not just a candidate filter).
  // Candidates come from one equi-join on the variant key — O(N·L)
  // rows shuffled by variant — and the levenshtein verify touches
  // candidates only: the dd2/dd4 discipline applied to string ER.
  private val j13 = Q(
    "q_j13_fuzzy_blocked",
    "edit-distance-1 name pairs via wildcard-variant blocking + levenshtein verify",
    (s, d) => {
      val names = Tables.customer(s, d).select(col("c_name").as("name"))
      val variants = names.select(col("name"),
          explode(transform(
            sequence(length(col("name")) - 5, length(col("name"))),
            i => concat(col("name").substr(lit(1), i - 1), lit("_"),
              col("name").substr(i + 1, length(col("name")))))).as("blk"))
      val a = variants.select(col("name").as("name_a"), col("blk"))
      val b = variants.select(col("name").as("name_b"), col("blk"))
      a.join(b, Seq("blk"))
        .filter(col("name_a") < col("name_b"))
        .filter(levenshtein(col("name_a"), col("name_b")) === 1)
        .select(col("name_a"), col("name_b"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""
      WITH v AS (
        SELECT name, substring(name, 1, i - 1) || '_' || substring(name, i + 1, length(name)) AS blk
        FROM (SELECT c_name AS name FROM customer),
             LATERAL (SELECT unnest(range(length(name) - 5, length(name) + 1)) AS i) p)
      SELECT a.name AS name_a, b.name AS name_b
      FROM v a JOIN v b ON a.blk = b.blk AND a.name < b.name
      WHERE levenshtein(a.name, b.name) = 1
      ORDER BY 1, 2"""))

  override val all: Seq[Q] =
    Seq(j1, j2, j3, j4, j5, j6, j6b, j7, j9, j11, j12, j13)
}
