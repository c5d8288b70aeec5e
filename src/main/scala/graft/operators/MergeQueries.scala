package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Merge/upsert patterns (§2.9) exercised through the Upsert kernel on
  * the testdata, with plain-SQL oracles describing the same semantics.
  */
object MergeQueries extends QueryModule {

  // M1: upsert — "existing" = orders not divisible by 3, "updates" =
  // orders divisible by 2 with a 10% price bump and status 'U'.
  private val m1 = Q(
    "q_m1_upsert_merge",
    "M1 staged upsert via full-outer coalescing merge (ref utility.R:574-644)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val base = o.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec2(col("o_totalprice")).as("price_dec"))
      val updates = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          round(dec2(col("o_totalprice")) * lit(BigDecimal("1.1")).cast("decimal(2,1)"), 2).as("price_dec"))
      Upsert.upsert(base, updates, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("price_dec"), 2).cast(DoubleType).as("price"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
        FROM orders WHERE o_orderkey % 3 <> 0),
      upd AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS price_dec
        FROM orders WHERE o_orderkey % 2 = 0)
      SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
             coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             CAST(round(coalesce(u.price_dec, b.price_dec), 2) AS DOUBLE) AS price
      FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
      ORDER BY 1"""))

  // M2: insert-if-absent append (ref ViollierMetadataReceiver.java:425-452).
  private val m2 = Q(
    "q_m2_insert_if_absent",
    "M2 on-conflict-do-nothing append via anti join (ref ViollierMetadataReceiver.java:425-452)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val existing = c.filter(col("c_custkey") < 500)
        .select(col("c_custkey"), col("c_mktsegment"))
      val incoming = c.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_mktsegment"))
      Upsert.insertIfAbsent(existing, incoming, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH existing AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 500),
           incoming AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000)
      SELECT * FROM existing
      UNION ALL
      SELECT * FROM incoming i WHERE NOT EXISTS
        (SELECT 1 FROM existing e WHERE e.c_custkey = i.c_custkey)
      ORDER BY c_custkey"""))

  // M3: change-kind classification (ref BatchProcessingWorker.java:214-297).
  private val m3 = Q(
    "q_m3_change_kinds",
    "M3 new/changed/unchanged classification via null-safe compare (ref BatchProcessingWorker.java:214-297)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val existing = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      val incoming = c.select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("SHIFTED")).otherwise(col("c_mktsegment")).as("c_mktsegment"))
      Upsert.changeKinds(existing, incoming, Seq("c_custkey"), Seq("c_mktsegment"))
        .groupBy(col("change_kind"))
        .agg(cnt.as("n"))
        .orderBy(col("change_kind"))
    },
    Some("""
      WITH existing AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
           incoming AS (SELECT c_custkey,
                          CASE WHEN c_custkey % 10 = 0 THEN 'SHIFTED' ELSE c_mktsegment END AS c_mktsegment
                        FROM customer)
      SELECT change_kind, count(*) AS n FROM (
        SELECT CASE WHEN e.c_custkey IS NULL THEN 'new'
                    WHEN i.c_mktsegment IS DISTINCT FROM e.c_mktsegment THEN 'changed'
                    ELSE 'unchanged' END AS change_kind
        FROM incoming i LEFT JOIN existing e ON i.c_custkey = e.c_custkey)
      GROUP BY 1 ORDER BY 1"""))

  // M4: delete-missing keep-set (ref GisaidApiImporter.java:374-381).
  private val m4 = Q(
    "q_m4_delete_missing",
    "M4 keep-set semi-join rewrite (ref GisaidApiImporter.java:374-381)",
    (s, d) => {
      val c = Tables.customer(s, d)
      val incoming = c.filter(col("c_acctbal") >= 0).select(col("c_custkey"))
      Upsert.deleteMissing(c, incoming, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM (SELECT c_custkey FROM customer WHERE c_acctbal >= 0) k
                    WHERE k.c_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  // SCD Type-2 versioned merge over two batches: batch 1 moves every
  // 7th customer's segment, batch 2 then moves every 5th — keys in
  // both (every 35th) accumulate THREE versions, proving closed
  // history passes through untouched while only open rows merge.
  // Integer version stamps, no timestamps (deterministic, no DATE in
  // the gate).
  private val m5 = Q(
    "q_m5_scd2",
    "SCD Type-2 versioned merge: two batches of segment changes with full history",
    (s, d) => {
      val c = Tables.customer(s, d)
      val v0 = c.select(col("c_custkey"), col("c_mktsegment"),
        lit(0L).as("vfrom"), lit(null).cast("bigint").as("vto"))
      val b1 = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), lit("MOVED").as("c_mktsegment"))
        .unionByName(c.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_mktsegment")))
      val v1 = Upsert.scd2Apply(v0, b1, Seq("c_custkey"), Seq("c_mktsegment"), 1L)
      val b2 = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), lit("MOVED2").as("c_mktsegment"))
      val v2 = Upsert.scd2Apply(v1, b2, Seq("c_custkey"), Seq("c_mktsegment"), 2L)
      v2.orderBy(col("c_custkey"), col("vfrom"))
    },
    Some("""
      WITH v0 AS MATERIALIZED (
        SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS vfrom,
               CAST(NULL AS BIGINT) AS vto
        FROM customer),
      b1 AS MATERIALIZED (
        SELECT c_custkey, 'MOVED' AS c_mktsegment FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_mktsegment FROM customer WHERE c_custkey % 13 = 0),
      k1 AS MATERIALIZED (
        SELECT b.c_custkey, b.c_mktsegment,
               CASE WHEN o.c_custkey IS NULL THEN 'new'
                    WHEN o.c_mktsegment IS DISTINCT FROM b.c_mktsegment THEN 'changed'
                    ELSE 'unchanged' END AS kind
        FROM b1 b LEFT JOIN (SELECT * FROM v0 WHERE vto IS NULL) o
          ON o.c_custkey = b.c_custkey),
      ck1 AS (SELECT c_custkey FROM k1 WHERE kind = 'changed'),
      v1 AS MATERIALIZED (
        SELECT * FROM v0 WHERE vto IS NOT NULL
        UNION ALL
        SELECT o.c_custkey, o.c_mktsegment, o.vfrom, CAST(1 AS BIGINT) AS vto
        FROM (SELECT * FROM v0 WHERE vto IS NULL) o JOIN ck1 c ON c.c_custkey = o.c_custkey
        UNION ALL
        SELECT o.* FROM (SELECT * FROM v0 WHERE vto IS NULL) o
        LEFT JOIN ck1 c ON c.c_custkey = o.c_custkey WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT c_custkey, c_mktsegment, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
        FROM k1 WHERE kind <> 'unchanged'),
      b2 AS MATERIALIZED (
        SELECT c_custkey, 'MOVED2' AS c_mktsegment FROM customer WHERE c_custkey % 5 = 0),
      k2 AS MATERIALIZED (
        SELECT b.c_custkey, b.c_mktsegment,
               CASE WHEN o.c_custkey IS NULL THEN 'new'
                    WHEN o.c_mktsegment IS DISTINCT FROM b.c_mktsegment THEN 'changed'
                    ELSE 'unchanged' END AS kind
        FROM b2 b LEFT JOIN (SELECT * FROM v1 WHERE vto IS NULL) o
          ON o.c_custkey = b.c_custkey),
      ck2 AS (SELECT c_custkey FROM k2 WHERE kind = 'changed'),
      v2 AS (
        SELECT * FROM v1 WHERE vto IS NOT NULL
        UNION ALL
        SELECT o.c_custkey, o.c_mktsegment, o.vfrom, CAST(2 AS BIGINT) AS vto
        FROM (SELECT * FROM v1 WHERE vto IS NULL) o JOIN ck2 c ON c.c_custkey = o.c_custkey
        UNION ALL
        SELECT o.* FROM (SELECT * FROM v1 WHERE vto IS NULL) o
        LEFT JOIN ck2 c ON c.c_custkey = o.c_custkey WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT c_custkey, c_mktsegment, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
        FROM k2 WHERE kind <> 'unchanged')
      SELECT c_custkey, c_mktsegment, vfrom, vto FROM v2
      ORDER BY c_custkey, vfrom"""))

  override val all: Seq[Q] = Seq(m1, m2, m3, m4, m5)
}
