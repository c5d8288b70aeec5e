package graft.operators

import org.apache.spark.sql.DataFrame
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
