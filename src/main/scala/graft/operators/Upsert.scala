package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge primitives for immutable-table rewrites — SURVEY.md §2.9.
  *
  * The reference's central ETL primitive is a staged upsert into Postgres
  * (`database/R/utility.R:574-644`: staging table → INSERT WHERE NOT
  * EXISTS → UPDATE FROM). On a file-based engine every mutation becomes
  * a full-table (or partition) rewrite; these helpers produce the merged
  * frame, and the caller writes it with an atomic swap (new path +
  * rename). All joins shuffle on the merge keys — at 100 TB the table
  * should be bucketed/partitioned by the same keys so the merge is
  * co-located and AQE handles stragglers.
  */
object Upsert {

  private def tag(df: DataFrame, prefix: String): DataFrame =
    df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, prefix + c))

  /** M1: generic upsert — rows in `updates` replace/extend rows in
    * `existing` on `keys`; non-key columns prefer the update value,
    * falling back to the existing one (`coalesce(update, existing)`),
    * mirroring `utility.R:574-644`. Columns present in only one side
    * pass through.
    */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val e = tag(existing, "e_")
    val u = tag(updates, "u_")
    val cond = keys.map(k => e(s"e_$k") === u(s"u_$k")).reduce(_ && _)
    val joined = e.join(u, cond, "full")
    val outCols = (existing.columns ++ updates.columns.filterNot(existing.columns.contains)).toSeq
    joined.select(outCols.map { c =>
      val hasE = existing.columns.contains(c)
      val hasU = updates.columns.contains(c)
      if (hasE && hasU) coalesce(col(s"u_$c"), col(s"e_$c")).as(c)
      else if (hasU) col(s"u_$c").as(c)
      else col(s"e_$c").as(c)
    }: _*)
  }

  /** M8: null-guarded merge — like upsert but existing non-null values
    * WIN (`update ... set gisaid_id = ? where gisaid_id is null`,
    * BatchProcessingWorker.java:692-711): updates only fill holes. */
  def upsertKeepExisting(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val e = tag(existing, "e_")
    val u = tag(updates, "u_")
    val cond = keys.map(k => e(s"e_$k") === u(s"u_$k")).reduce(_ && _)
    val joined = e.join(u, cond, "full")
    val outCols = (existing.columns ++ updates.columns.filterNot(existing.columns.contains)).toSeq
    joined.select(outCols.map { c =>
      val hasE = existing.columns.contains(c)
      val hasU = updates.columns.contains(c)
      if (hasE && hasU) coalesce(col(s"e_$c"), col(s"u_$c")).as(c)
      else if (hasU) col(s"u_$c").as(c)
      else col(s"e_$c").as(c)
    }: _*)
  }

  /** M2: `insert on conflict do nothing` — append only rows whose key is
    * absent (`ViollierMetadataReceiver.java:425-452`). */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti"),
      allowMissingColumns = false)

  /** M4: deletion set — keep only rows whose key is still present in
    * `incoming` (`GisaidApiImporter.java:374-381`). */
  def deleteMissing(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_semi")

  /** M3: change detection — returns incoming rows joined with a
    * `change_kind` column: 'new' (key absent), 'changed' (any compared
    * column differs, null-safe), 'unchanged'
    * (`BatchProcessingWorker.java:214-297`). */
  /** SCD Type-2 versioned merge: apply `batch` to the versioned table
    * `versioned` (rows carry `vfrom`/`vto`; `vto` NULL = open/current
    * version), producing the new full history. Integer batch ids, no
    * timestamps — deterministic and engine-portable.
    *
    *  - a key whose OPEN row's compare-cols differ from the batch row:
    *    the open row closes (`vto = batchId`) and a new open version
    *    is appended (`vfrom = batchId`);
    *  - a key new to the table: appended open at `batchId`;
    *  - unchanged and absent-from-batch keys pass through untouched;
    *    CLOSED history rows always pass through.
    *
    * The Kimball dimension-history pattern the reference's
    * overwrite-style upserts (M1) deliberately lose; one full-outer
    * join of the OPEN slice against the batch keyed on the merge keys
    * (co-locate by bucketing at scale), history rows union through
    * untouched. */
  def scd2Apply(versioned: DataFrame, batch: DataFrame, keys: Seq[String],
      compareCols: Seq[String], batchId: Long): DataFrame = {
    // The schema contract is explicit: the versioned table must be
    // exactly keys ++ compareCols ++ (vfrom, vto). Fresh rows are built
    // from the batch's keys ++ compareCols only, so an extra passthrough
    // column would otherwise surface as an opaque unionByName failure at
    // execution time — fail here, at the call, with the fix spelled out.
    val expected = (keys ++ compareCols ++ Seq("vfrom", "vto")).toSet
    val actual = versioned.columns.toSet
    require(actual == expected,
      s"scd2Apply: versioned table columns ${actual.toSeq.sorted.mkString(",")} " +
        s"must be exactly keys++compareCols++(vfrom,vto) = ${expected.toSeq.sorted.mkString(",")}; " +
        "project the table (or add the column to compareCols) before applying")
    // ONE full-outer join of the whole versioned table against the
    // batch (the join condition's `vto IS NULL` restricts matching to
    // the OPEN slice, so history rows pass through as unmatched left
    // rows), then per joined row EMIT the 1–2 output versions through
    // an explode. The r15 rewrite: the previous form referenced
    // `versioned` six times across history/closed/untouched/kinds
    // branches, and DataFrames are trees, not DAGs — every reference
    // re-inlined (and re-executed) the entire upstream plan, so
    // CHAINED applies compounded ~6× per batch (two chained applies
    // over one table scanned its source 116 times; a 10-batch chain
    // would be 6¹⁰ — a genuine scale-killer for SCD chains). Each
    // operand is now referenced exactly once, so chained plans grow
    // LINEARLY, with one join per apply instead of three and no
    // materialization at all. Batch contract (unchanged from the old
    // form's semantics): at most one row per key per batch.
    val data = keys ++ compareCols
    val b = tag(batch.select(data.map(col): _*), "b_")
    val keyCond = keys.map(k => col(k) === col(s"b_$k")).reduce(_ && _)
    val j = versioned.join(b, keyCond && col("vto").isNull, "full")
    val differs = compareCols
      .map(c => !(col(c) <=> col(s"b_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    // side presence after the full join — key columns are non-null by
    // the SCD contract (same assumption changeKinds always made)
    val vPresent = col(keys.head).isNotNull
    val bPresent = col(s"b_${keys.head}").isNotNull
    def vRow(vto: Column) = struct(
      (data.map(c => col(c).as(c)) :+ col("vfrom").as("vfrom") :+ vto.as("vto")): _*)
    val bRow = struct(
      (keys.map(k => col(s"b_$k").as(k)) ++
        compareCols.map(c => col(s"b_$c").as(c)) :+
        lit(batchId).as("vfrom") :+ lit(null).cast("bigint").as("vto")): _*)
    val emitted = when(vPresent && bPresent,
        // matched open row: changed → close it and append the new
        // version; unchanged → pass it through open
        when(differs, array(vRow(lit(batchId)), bRow))
          .otherwise(array(vRow(col("vto")))))
      // history rows and opens absent from the batch pass through
      .when(vPresent, array(vRow(col("vto"))))
      // key new to the table: appended open at batchId
      .otherwise(array(bRow))
    j.select(explode(emitted).as("__r"))
      .select(versioned.columns.toSeq.map(f => col(s"__r.$f").as(f)): _*)
  }

  def changeKinds(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val e = tag(existing.select((keys ++ compareCols).map(col): _*), "e_")
    val cond = keys.map(k => col(k) === col(s"e_$k")).reduce(_ && _)
    val differs = compareCols
      .map(c => !(col(c) <=> col(s"e_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    incoming.join(e, cond, "left")
      .withColumn("change_kind",
        when(col(s"e_${keys.head}").isNull, "new")
          .when(differs, "changed")
          .otherwise("unchanged"))
      .select(incoming.columns.map(col) :+ col("change_kind"): _*)
  }
}
