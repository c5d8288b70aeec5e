package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming twin of the data-quality expectations suite
  * ([[graft.operators.Expectations]]) — the continuous-ingest form of
  * the import quality gate: per-check (violations, total) counters
  * maintained as BOUNDED streaming state (two longs per check, merged
  * monotonically as micro-batches arrive — counters only grow).
  *
  * Structured Streaming allows ONE aggregation per query, so the
  * batch suite's union-of-aggregates shape is re-expressed as a
  * single global conditional-count aggregate whose row then unpivots
  * STATELESSLY (map + explode) into the same (check, violations,
  * total) report rows — identical output schema, so a batch suite
  * and its stream read through one consumer. Referential integrity
  * joins the stream against the STATIC (broadcast) parent key set
  * before the one aggregation — a stream-static join, the supported
  * shape.
  *
  * Run in Complete mode: the report is O(#checks) rows, so re-emitting
  * it per micro-batch is free, and the last emission after a bounded
  * source drains is the batch suite bound-for-bound
  * (ExpectationsStreamSpec pins it, including the monotone-merge law:
  * doubling the source files exactly doubles every counter). */
object ExpectationsStream {

  /** One-aggregation column checks over a streaming frame: the same
    * (name, violation-predicate) specs as the batch
    * `Expectations.columnChecks`. */
  def columnChecks(stream: DataFrame, specs: Seq[(String, Column)]): DataFrame = {
    val aggs = specs.flatMap { case (name, bad) =>
      Seq(count(when(bad, 1)).cast(LongType).as(s"__v_$name"),
        count(lit(1)).cast(LongType).as(s"__t_$name"))
    }
    val one = stream.agg(aggs.head, aggs.tail: _*)
    // stateless unpivot AFTER the single aggregation: a map literal
    // check -> [violations, total], exploded to report rows
    val entries = specs.flatMap { case (name, _) =>
      Seq(lit(name), array(col(s"__v_$name"), col(s"__t_$name")))
    }
    one.select(explode(map(entries: _*)).as(Seq("check", "__vt")))
      .select(col("check"), col("__vt")(0).as("violations"), col("__vt")(1).as("total"))
  }

  /** Streaming referential-integrity check: orphan counting as a
    * stream-static broadcast anti... expressed as a LEFT join + one
    * conditional count (a left ANTI join followed by an aggregation
    * is the same single-aggregation query; the left-join form also
    * yields `total` from the same scan). */
  def foreignKeyCheck(stream: DataFrame, childKey: String, name: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__present", lit(1))
    stream.select(col(childKey))
      .join(broadcast(pk), Seq(childKey), "left")
      .agg(count(when(col("__present").isNull, 1)).cast(LongType).as("violations"),
        count(lit(1)).cast(LongType).as("total"))
      .select(lit(name).as("check"), col("violations"), col("total"))
  }
}
