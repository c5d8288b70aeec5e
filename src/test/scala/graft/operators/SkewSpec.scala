package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted count equals plain count on a skewed key distribution") {
    import spark.implicits._
    val df = ((1 to 10000).map(_ => "hot") ++ (1 to 50).map(i => s"cold$i")).toDF("k")
    val plain = df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"), 16).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum (decimal-exact)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("hot", BigDecimal(i))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v")).head().getDecimal(1)
    val salted = Skew.saltedSum(df, Seq("k"), col("v"), 8).head().getDecimal(1)
    assert(salted.compareTo(plain) == 0)
  }

  test("salted join replicates small side and preserves row count") {
    import spark.implicits._
    val big = (1 to 1000).map(_ => ("hot", 1)).toDF("k", "x")
    val small = Seq(("hot", "dim")).toDF("k", "label")
    val joined = Skew.saltBig(big, 4)
      .join(Skew.replicateSmall(small, 4), Seq("k", "__salt"))
    assert(joined.count() == 1000)
    assert(joined.select("label").distinct().head().getString(0) == "dim")
  }

  test("dashboard main view recodes and unions padded negatives") {
    import spark.implicits._
    import graft.analytics.Reports
    val cases = Seq(
      (java.sql.Date.valueOf("2021-03-01"), "ZH", 25, false),
      (java.sql.Date.valueOf("2021-03-01"), "GE", 85, false),
      (java.sql.Date.valueOf("2021-03-01"), "ZH", 30, true) // armee → carved out
    ).toDF("date", "canton", "age", "is_armee")
    // negatives are a counts table (init.sql:896-898): age_group has
    // embedded spaces, negative_tests is the multiplier
    val negatives = Seq((java.sql.Date.valueOf("2021-03-01"), "TI", "20 - 29", 7))
      .toDF("date", "canton", "age_group", "negative_tests")
    val out = Reports.dashboardMainView(cases, negatives).collect()
      .map(r => (r.getAs[String]("grossregion"), r.getAs[String]("age_group"),
        r.getAs[Boolean]("positive"), r.getAs[Long]("n"))).toSet
    assert(out == Set(
      ("Grossregion Zurich", "20-29", true, 1L),
      ("Lake Geneva region", "80+", true, 1L),
      ("Grossregion Tessin", "20-29", false, 7L)))
    // no is_armee column → reference semantics, no carve-out
    val outNoFlag = Reports.dashboardMainView(cases.drop("is_armee"), negatives)
      .filter(col("positive")).agg(sum(col("n"))).head().getLong(0)
    assert(outNoFlag == 3L)
  }
}
