package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join — points into half-open intervals
  * (`start <= t < end`) when BOTH sides are big. Spark's native plan
  * for a pure range predicate is BroadcastNestedLoopJoin (fine only
  * while one side broadcasts) or a cartesian; the scale form maps both
  * sides onto fixed-width time buckets: every point lands in one
  * bucket, every interval EXPLODES to the buckets it covers, and the
  * join becomes a plain shuffle equi-join on the bucket id plus an
  * exact refine filter. Work scales with true overlap density —
  * interval rows are duplicated ⌈len/bucketWidth⌉ times, so pick
  * `bucketWidth` near the median interval length (the classic
  * interval-binning trade: too small explodes intervals, too large
  * degrades toward per-bucket cartesians).
  */
object RangeJoin {

  /** `t`, `start`, `end` are numeric (cast dates to epoch days /
    * timestamps to epoch seconds first). Column names must be disjoint
    * across the two inputs (alias before calling). Empty intervals
    * (start >= end) match nothing. */
  def pointInInterval(points: DataFrame, tCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(tCol) / bucketWidth).cast("long"))
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    p.join(i, "__bucket")
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("__bucket")
  }
}
