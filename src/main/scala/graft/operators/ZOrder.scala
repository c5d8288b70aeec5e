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

  // ------------------------------------------------------------------
  // Hilbert curve — the stronger locality key (Hilbert 1891; the
  // xy2d walk of Warren's Hacker's Delight / Wikipedia's canonical
  // form; what lakehouse "liquid"-style clustering uses instead of
  // Z-order): consecutive keys are ALWAYS 4-adjacent cells, so a
  // contiguous key range never jumps across the plane the way a
  // Morton range does at quadrant seams — tighter bounding boxes per
  // file at the same sort cost. Pure integer bit arithmetic, unrolled
  // bits-per-axis levels; each level is its own projection so the
  // expression tree stays LINEAR in bits (a single nested Column would
  // double per level — 2^bits nodes).
  // ------------------------------------------------------------------

  /** Adds `out` = the Hilbert d-index of (x, y), both in [0, 2^bits). */
  def hilbertKey(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(2 * bits <= 62, "key must stay inside BIGINT")
    var cur = df.withColumn("__hx", x.cast(LongType))
      .withColumn("__hy", y.cast(LongType))
      .withColumn(out, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx", shiftrightunsigned(col("__hx"), i).bitwiseAND(lit(1L)))
        .withColumn("__ry", shiftrightunsigned(col("__hy"), i).bitwiseAND(lit(1L)))
        .withColumn(out, col(out) + lit(s * s) *
          (when(col("__rx") === 0L && col("__ry") === 0L, 0L)
            .when(col("__rx") === 0L, 1L)
            .when(col("__ry") === 1L, 2L)
            .otherwise(3L)))
        // rotate: flip both when rx = 1 ∧ ry = 0, then swap axes
        .withColumn("__nx", when(col("__ry") === 0L,
          when(col("__rx") === 1L, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0L,
          when(col("__rx") === 1L, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__rx", "__ry", "__nx", "__ny")
    }
    cur.drop("__hx", "__hy")
  }

  /** DuckDB twin of [[hilbertKey]]: a chain of `bits` CTEs (hb1..hbN,
    * reading hb0 = caller-provided base with columns hx, hy, hd=0 plus
    * `passCols`); splice into WITH and select `hd` from [[hilbertFinalCte]]. */
  def hilbertSqlCtes(bits: Int, passCols: Seq[String]): String = {
    val pass = passCols.mkString(", ")
    (bits - 1 to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      s"""hb${k + 1} AS (
         |  SELECT $pass,
         |    CASE WHEN ((hy >> $i) & 1) = 0
         |         THEN CASE WHEN ((hx >> $i) & 1) = 1 THEN ${s - 1} - hy ELSE hy END
         |         ELSE hx END AS hx,
         |    CASE WHEN ((hy >> $i) & 1) = 0
         |         THEN CASE WHEN ((hx >> $i) & 1) = 1 THEN ${s - 1} - hx ELSE hx END
         |         ELSE hy END AS hy,
         |    hd + ${s * s} * (CASE WHEN ((hx >> $i) & 1) = 0 AND ((hy >> $i) & 1) = 0 THEN 0
         |                         WHEN ((hx >> $i) & 1) = 0 THEN 1
         |                         WHEN ((hy >> $i) & 1) = 1 THEN 2 ELSE 3 END) AS hd
         |  FROM hb$k)""".stripMargin
    }.mkString(",\n")
  }

  def hilbertFinalCte(bits: Int): String = s"hb$bits"
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

  private val z2 = Q(
    "q_z2_hilbert_key",
    s"Hilbert clustering key of (l_partkey, l_suppkey) mod 2^$Bits",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      hilbertKey(li.select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(1 << Bits)).as("__x"),
          pmod(col("l_suppkey"), lit(1 << Bits)).as("__y")),
          col("__x"), col("__y"), Bits, "hkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("hkey"))
        .orderBy(col("hkey"), col("l_orderkey"), col("l_linenumber"))
        .limit(500)
    },
    Some(s"""
      WITH hb0 AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey % ${1 << Bits} AS BIGINT) AS hx,
               CAST(l_suppkey % ${1 << Bits} AS BIGINT) AS hy,
               CAST(0 AS BIGINT) AS hd
        FROM lineitem),
      ${hilbertSqlCtes(Bits, Seq("l_orderkey", "l_linenumber"))}
      SELECT l_orderkey, l_linenumber, hd AS hkey
      FROM ${hilbertFinalCte(Bits)}
      ORDER BY hkey, l_orderkey, l_linenumber
      LIMIT 500"""))

  override val all: Seq[Q] = Seq(z1, z2)
}
