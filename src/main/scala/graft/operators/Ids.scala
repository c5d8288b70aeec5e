package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global id allocation without the single-task corpus sort.
  *
  * The gate form of W1 (`q_w1`, reference parity) is
  * `row_number() OVER (ORDER BY …)` — an UNPARTITIONED window, which
  * Spark executes as ONE task sorting the whole input. Correct at gate
  * scale, the textbook driver-of-one at 100 TB. The production form
  * is the partition-offset construction: range-partition on the order
  * keys (partition i's keys all sort before partition i+1's), sort
  * within partitions (parallel), then `zipWithIndex` — whose two
  * internal jobs (per-partition counts, then offset-adding map) run
  * over the SAME shuffle output, so the numbering is consistent by
  * construction.
  *
  * Why the RDD hop instead of a pure-DF window + broadcast-offset
  * join: the offsets must be derived from the SAME partition
  * assignment that ranks the rows, and `repartitionByRange` SAMPLES
  * its boundaries with a seed derived from the physical RDD — two
  * separate DF actions (a counts job, then the result job)
  * re-instantiate the exchange and can land boundary-adjacent rows in
  * different partitions, silently skewing every downstream id
  * (measured: 1007/1500 ids off by small offsets on a 3-partition
  * desc ordering). `zipWithIndex` is the one primitive that welds
  * both passes to a single lineage; this is exactly the
  * "genuine per-partition imperative logic" carve-out.
  *
  * Deterministic iff the order keys are UNIQUE (the fz1 lesson —
  * with ties any global row_number is tie-arbitrary).
  */
object Ids {

  /** Append a dense 1-based global `idCol` ordered by `order`
    * (sort-direction columns like `col.desc` are honored by both the
    * range partitioner and the in-partition sort). */
  def globalRowNumber(df: DataFrame, order: Seq[Column], idCol: String,
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withId, schema)
  }
}
