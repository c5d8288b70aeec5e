package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable backward as-of join — the generic form of q_ev3's
  * conditional-running-max trick: for every left row, attach the
  * payload of the LATEST right row with the same keys and
  * `rightTime <= leftTime` (or `<` with `strict = true`).
  *
  * Plan shape: tag both inputs, UNION them, and run ONE window over
  * (keys) ordered by time with `last(payload, ignoreNulls)` — a single
  * shuffle keyed by the join keys, linear in |left| + |right|. The
  * naive alternative (range join + per-row max) explodes to
  * O(|left| × |matching right|) before aggregating it back down;
  * Spark has no native as-of join, and this union-window form is the
  * scale-correct composition of built-ins (the same plan q_ev3's gate
  * verifies against DuckDB).
  */
object AsofJoin {

  /** `payload` columns are taken from `right` and appended (nullable,
    * prefixed `asof_`) to every `left` row. Right rows tie-break
    * before left rows at equal timestamps unless `strict`; right rows
    * sharing the same (keys, time) resolve to the struct-wise MAXIMUM
    * payload (deterministic — payload types must therefore be
    * ORDERABLE: a map-typed payload fails at analysis).
    *
    * Reserved names: `__l`/`__r`/`__t`/`__ord` are claimed internally,
    * and each payload column `p` lands as `asof_p` — inputs carrying
    * any of those names are rejected up front rather than silently
    * shadowed. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val reserved = Set("__l", "__r", "__t", "__ord")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"as-of join reserves column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
    val outClash = payload.map(p => s"asof_$p").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"as-of output column(s) ${outClash.mkString(", ")} collide with left input; " +
        "rename the left column(s) or the payload")
    val leftCols = left.columns.toSeq
    val lSchema = left.schema
    val rSchema = right.select(payload.map(col): _*).schema
    // ascending order + unboundedPreceding frame: a row sees everything
    // ordered at-or-before itself. Inclusive (<=): rights at equal time
    // order BEFORE lefts; strict (<): after.
    val rightOrd = if (strict) 1 else 0
    val l = left.select(
      keys.map(col) ++ Seq(
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rSchema).as("__r"),
        col(leftTime).as("__t"), lit(1 - rightOrd).as("__ord")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        lit(null).cast(lSchema).as("__l"),
        struct(payload.map(col): _*).as("__r"),
        col(rightTime).as("__t"), lit(rightOrd).as("__ord")): _*)
    // the trailing __r orders right rows that share (keys, time)
    // deterministically by payload (struct field-wise comparison) —
    // without it, last() would return whichever peer the sort happened
    // to place later, varying across partitionings
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__ord").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
    val out = leftCols.map(c => joined("__l").getField(c).as(c)) ++
      payload.map(p => joined("__asof").getField(p).as(s"asof_$p"))
    joined.select(out: _*)
  }
}
