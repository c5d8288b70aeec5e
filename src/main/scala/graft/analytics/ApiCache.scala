package graft.analytics

import graft.operators.Upsert
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving-layer cache + jsonb surface.
  *
  * `spectrum_api_cache_sample` (ref `database/init.sql:1198-1212`): a
  * result cache keyed by the FULL query-parameter tuple (unique index
  * over all ten fields). Here the cache is a parquet table with the
  * same key; hit/miss is a key-equality join and writes are M1 upserts
  * — at scale both partition by the key hash, and the hot path (lookup)
  * is one broadcast-able semi join because a cache scan prunes to the
  * requested keys.
  *
  * jsonb columns (`init.sql:1260` data_type, `init.sql:1343-1348`
  * wastewater data): stored as raw StringType and parsed on query via
  * `from_json` with a declared StructType — SURVEY §1.3's mapping.
  */
object ApiCache {

  /** The unique-index key of `spectrum_api_cache_sample`. */
  val keyCols: Seq[String] = Seq("fields", "private_version", "region", "country",
    "mutations", "match_percentage", "pangolin_lineage", "data_type", "date_from", "date_to")

  /** Cache lookup: requests × cache on the full key. Returns
    * (hits with `cache` payload, misses without). */
  def lookup(cache: DataFrame, requests: DataFrame): (DataFrame, DataFrame) = {
    val hits = requests.join(cache, keyCols)
    val misses = requests.join(cache.select(keyCols.map(col): _*), keyCols, "left_anti")
    (hits, misses)
  }

  /** Store computed results: replace-on-key (the reference's unique
    * index makes INSERT .. ON CONFLICT semantics; M1 upsert here). */
  def store(cache: DataFrame, computed: DataFrame): DataFrame =
    Upsert.upsert(cache, computed, keyCols)

  // ---------------- jsonb surface ----------------

  /** Wastewater result payload (`spectrum_waste_water_result.data`):
    * a variant time series with CI bands plus an update stamp — the
    * shape the cov-spectrum wastewater panel consumes. */
  val wasteWaterDataSchema: StructType = StructType(Seq(
    StructField("updateDate", StringType),
    StructField("timeseriesSummary", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("location", StringType),
      StructField("proportion", DoubleType),
      StructField("proportionLower", DoubleType),
      StructField("proportionUpper", DoubleType))))),
    StructField("mutationOccurrences", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("nucMutation", StringType),
      StructField("proportion", DoubleType)))))))

  /** `spectrum_new_interesting_variant.data_type` payload. */
  val interestingVariantDataTypeSchema: StructType = StructType(Seq(
    StructField("dataType", StringType),
    StructField("granularity", StringType)))

  /** Parse a jsonb-as-string column with a declared schema. */
  def parseJsonb(c: Column, schema: StructType): Column = from_json(c, schema)

  /** Typed view over `spectrum_waste_water_result`: explode the time
    * series into relational rows for analytics. */
  def wasteWaterTimeseries(results: DataFrame): DataFrame =
    results
      .withColumn("__d", parseJsonb(col("data"), wasteWaterDataSchema))
      .select(col("variant_name"), col("location"),
        to_date(col("__d.updateDate")).as("update_date"),
        explode(col("__d.timeseriesSummary")).as("ts"))
      .select(col("variant_name"), col("location"), col("update_date"),
        to_date(col("ts.date")).as("date"),
        col("ts.proportion").as("proportion"),
        col("ts.proportionLower").as("proportion_lower"),
        col("ts.proportionUpper").as("proportion_upper"))
}
