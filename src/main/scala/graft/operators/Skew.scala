package graft.operators

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
