package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Shared column helpers.
  *
  * Money math goes through DecimalType so sums are exact and
  * order-independent — a double sum over a shuffled dataset is not
  * reproducible bit-for-bit across engines/partitionings, a decimal sum
  * is. Cast back to double only after the final round(), which yields
  * identical bits in any IEEE-754 engine (incl. the DuckDB oracle).
  */
object Exprs {
  /** Exact 2-dp decimal (prices). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact 4-dp decimal (rates: discount/tax). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact 6-dp decimal (measures with more precision). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent exact money sum → double for output. */
  def moneySum(c: Column): Column = round(sum(dec2(c)), 2).cast(DoubleType)

  /** Exact average: decimal sum cast to double, divided by count.
    * Both divisions are a single IEEE double op → engine-independent. */
  def exactAvg(c: Column): Column =
    (sum(dec6(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** count(*) flavor that matches DuckDB's BIGINT. */
  def cnt: Column = count(lit(1)).cast(LongType)

  /** 1/0 conditional counter (A2 sum(case when ...)). */
  def oneIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
}
