package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SCALING.md "Skew & AQE").
  *
  * AQE's skew-join splitting covers joins; a skewed AGGREGATION key
  * (one key holding more than an executor's partition share) needs
  * salting: aggregate per (key, salt) first, then re-aggregate per
  * key. The second stage sees at most `salts` rows per key.
  */
object Skew {

  /** Two-stage salted groupBy-count: exact counts, skew-proof. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int): DataFrame = {
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Two-stage salted sum (decimal-exact input recommended). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: Column, salts: Int): DataFrame = {
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("total"))
  }

  /** Broadcast-salt a skewed JOIN: replicate the small side `salts`
    * times and salt the big side's key so one hot key spreads across
    * `salts` tasks. Use when AQE can't split (e.g. the skewed side is
    * the output of an aggregation). Join on keyCols :+ "__salt". */
  def saltBig(big: DataFrame, salts: Int): DataFrame =
    big.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))

  def replicateSmall(small: DataFrame, salts: Int): DataFrame =
    small.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
}

/** Skew-mitigation gates: the salted forms must be BIT-IDENTICAL to
  * their unsalted semantics — the oracle is the plain groupBy / plain
  * join, so the gate proves the mitigation changes the physical plan
  * only. (Decimal sums are order-independent, which is exactly what
  * makes salting safe for money math.) */
object SkewQueries extends QueryModule {

  private val sk1 = Q(
    "q_sk1_salted_agg",
    "two-stage salted aggregation ≡ plain groupBy (exact decimal sums, skew-proof)",
    (s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_suppkey"), dec2(col("l_extendedprice")).as("__p"))
      Skew.saltedSum(l, Seq("l_suppkey"), col("__p"), salts = 16)
        .select(col("l_suppkey"),
          round(col("total"), 2).cast("double").as("revenue"))
        .orderBy(col("l_suppkey"))
    },
    Some("""
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""))

  private val sk2 = Q(
    "q_sk2_salted_join",
    "salt-replicated join ≡ plain join (hot build key spread across salt tasks)",
    (s, d) => {
      val l = Skew.saltBig(Tables.lineitem(s, d)
        .select(col("l_partkey"), dec2(col("l_extendedprice")).as("__p")), salts = 8)
      val p = Skew.replicateSmall(
        Tables.part(s, d).select(col("p_partkey"), col("p_brand")), salts = 8)
      l.join(p, l("l_partkey") === p("p_partkey") && l("__salt") === p("__salt"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("__p")), 2).cast("double").as("revenue"))
        .orderBy(col("p_brand"))
    },
    Some("""
      SELECT p_brand,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  override val all: Seq[Q] = Seq(sk1, sk2)
}
