package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Serving layer: API result cache keyed by the full parameter tuple
  * (`init.sql:1198-1212`) and jsonb parse surface (`init.sql:1343`). */
class ApiCacheSpec extends SparkSpec {

  private def req(fields: String, priv: Boolean, country: String) = (
    fields, priv, "Europe", country, "", 100.0, "B.1.1.7", "SURVEILLANCE",
    java.sql.Date.valueOf("2021-01-01"), java.sql.Date.valueOf("2021-03-01"))

  test("cache: full-key lookup splits hits/misses; store upserts on the key") {
    import spark.implicits._
    val cols = ApiCache.keyCols
    val cache = Seq(
      ("[date]", false, "Europe", "Switzerland", "", 100.0, "B.1.1.7", "SURVEILLANCE",
        java.sql.Date.valueOf("2021-01-01"), java.sql.Date.valueOf("2021-03-01"), "cached-payload")
    ).toDF(cols :+ "cache": _*)
    val requests = Seq(
      req("[date]", false, "Switzerland"), // hit
      req("[date]", false, "Germany"),     // miss (one key field differs)
      req("[date]", true, "Switzerland")   // miss (private_version differs)
    ).toDF(cols: _*)
    val (hits, misses) = ApiCache.lookup(cache, requests)
    assert(hits.count() == 1 && hits.head().getAs[String]("cache") == "cached-payload")
    assert(misses.count() == 2)

    val computed = misses.withColumn("cache", concat(lit("fresh:"), col("country")))
    val updated = ApiCache.store(cache, computed)
    assert(updated.count() == 3)
    // replacing an existing key overwrites, not duplicates
    val again = ApiCache.store(updated,
      cache.withColumn("cache", lit("recomputed")))
    assert(again.count() == 3)
    assert(again.filter(col("cache") === "recomputed").count() == 1)
  }

  test("jsonb: wastewater data parses and explodes into typed rows") {
    import spark.implicits._
    val results = Seq(
      ("B.1.1.7", "Zurich (ZH)",
        """{"updateDate":"2021-03-10",
           "timeseriesSummary":[
             {"date":"2021-03-01","location":"Zurich (ZH)","proportion":0.12,"proportionLower":0.08,"proportionUpper":0.18},
             {"date":"2021-03-02","location":"Zurich (ZH)","proportion":0.15,"proportionLower":0.10,"proportionUpper":0.22}],
           "mutationOccurrences":[{"date":"2021-03-01","nucMutation":"C913T","proportion":0.4}]}""")
    ).toDF("variant_name", "location", "data")
    val ts = ApiCache.wasteWaterTimeseries(results).collect()
    assert(ts.length == 2)
    val first = ts.minBy(_.getAs[java.sql.Date]("date").toString)
    assert(first.getAs[java.sql.Date]("update_date").toString == "2021-03-10")
    assert(math.abs(first.getAs[Double]("proportion") - 0.12) < 1e-12)
    assert(math.abs(first.getAs[Double]("proportion_upper") - 0.18) < 1e-12)
  }

  test("jsonb: malformed payload yields null struct, not a crash") {
    import spark.implicits._
    val bad = Seq(("X", "Basel", "{not json")).toDF("variant_name", "location", "data")
    assert(ApiCache.wasteWaterTimeseries(bad).count() == 0) // explode of null array drops the row
    // PERMISSIVE mode: malformed input parses to a struct of nulls
    val parsed = bad.select(ApiCache.parseJsonb(col("data"), ApiCache.wasteWaterDataSchema).as("d"))
      .select(col("d.updateDate"), col("d.timeseriesSummary")).head()
    assert(parsed.isNullAt(0) && parsed.isNullAt(1))
  }
}
