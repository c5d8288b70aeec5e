package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering keys — the multi-dimensional data-
  * layout tool (Morton 1966; the standard lakehouse OPTIMIZE ZORDER
  * move). Sorting a table by the bit-interleaved key of several
  * columns gives every chunk of the sorted order a tight bounding box
  * in ALL those dimensions at once, so file-level min/max statistics
  * prune scans for predicates on ANY of them — single-column sorting
  * only ever prunes its own column.
  *
  * The key is pure integer bit arithmetic (shift/mask/or with
  * compile-time-constant shifts), so it whole-stage-codegens on the
  * scan and reproduces bit-for-bit in any engine — the q_z1 gate
  * checks the interleave against DuckDB. At 100 TB the write pattern
  * is `repartitionByRange(zkey).sortWithinPartitions(zkey)` — a single
  * range shuffle, after which every parquet file covers a small
  * z-range = a small hyper-rectangle.
  */
object ZOrder {

  /** Morton key of `dims` non-negative columns using the low
    * `bitsPerDim` bits of each (values must fit — mask or mod first).
    * Bit i of dim d lands at position i·dims + d. */
  def zOrderKey(dims: Seq[Column], bitsPerDim: Int): Column = {
    require(dims.nonEmpty && bitsPerDim * dims.size <= 62,
      "interleaved width must stay inside BIGINT")
    val terms = for {
      (d, di) <- dims.zipWithIndex
      i <- 0 until bitsPerDim
    } yield shiftleft(
      shiftrightunsigned(d.cast(LongType), i).bitwiseAND(lit(1L)),
      i * dims.size + di)
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[zOrderKey]] (same bit placement). */
  def zOrderKeySql(dims: Seq[String], bitsPerDim: Int): String = {
    val terms = for {
      (d, di) <- dims.zipWithIndex
      i <- 0 until bitsPerDim
    } yield s"(((CAST($d AS BIGINT) >> $i) & 1) << ${i * dims.size + di})"
    terms.mkString("(", " | ", ")")
  }

  /** Cluster a frame for write: one range shuffle on the z-key, sorted
    * within partitions — each output file then covers one small
    * z-range, i.e. one small hyper-rectangle of the dims. */
  def clusterByZ(df: DataFrame, dims: Seq[Column], bitsPerDim: Int,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z", zOrderKey(dims, bitsPerDim))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
  }
}

/** Z-order gate: the interleaved key itself is the contract. */
object ZOrderQueries extends QueryModule {
  import ZOrder._

  private val Bits = 10 // two 10-bit dims → 20-bit z, far inside BIGINT

  private val z1 = Q(
    "q_z1_zorder_key",
    s"Morton/Z-order clustering key of (l_partkey, l_suppkey) mod 2^$Bits",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
          zOrderKey(Seq(pmod(col("l_partkey"), lit(1 << Bits)),
            pmod(col("l_suppkey"), lit(1 << Bits))), Bits).as("zkey"))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
        .limit(500)
    },
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             ${zOrderKeySql(Seq(s"l_partkey % ${1 << Bits}", s"l_suppkey % ${1 << Bits}"), Bits)} AS zkey
      FROM lineitem
      ORDER BY zkey, l_orderkey, l_linenumber
      LIMIT 500"""))

  override val all: Seq[Q] = Seq(z1)
}
