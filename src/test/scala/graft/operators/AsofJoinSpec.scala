package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  test("backward as-of: latest prior payload per key, ties inclusive, no-match null") {
    import spark.implicits._
    val trades = Seq(
      ("aapl", 10L, 1), ("aapl", 20L, 2), ("aapl", 25L, 3),
      ("msft", 15L, 4), ("goog", 9L, 5))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("aapl", 5L, 100.0), ("aapl", 20L, 101.0), ("aapl", 30L, 102.0),
      ("msft", 10L, 50.0))
      .toDF("sym", "t", "px")
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select("trade_id", "asof_px").as[(Int, Option[Double])].collect().toMap
    assert(out == Map(
      1 -> Some(100.0),  // quote@5 <= 10
      2 -> Some(101.0),  // quote@20 == 20: inclusive
      3 -> Some(101.0),  // latest <= 25 is quote@20
      4 -> Some(50.0),
      5 -> None))        // goog has no quotes

    val strictOut = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
      strict = true)
      .select("trade_id", "asof_px").as[(Int, Option[Double])].collect().toMap
    assert(strictOut(2) == Some(100.0), "strict < must exclude the equal-time quote")
  }

  test("right rows sharing (key, time) resolve deterministically to the max payload") {
    import spark.implicits._
    val trades = Seq(("x", 25L, 1)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("x", 20L, 99.5), ("x", 20L, 101.0), ("x", 20L, 100.2))
      .toDF("sym", "t", "px")
    (1 to 3).foreach { shuffle =>
      val out = AsofJoin.backward(trades, quotes.repartition(shuffle), Seq("sym"),
        "t", "t", Seq("px"))
        .select("asof_px").as[Double].head()
      assert(out == 101.0, s"partitioning $shuffle changed the tie winner")
    }
  }

  test("matches q_ev3's specialized window form on the events table") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, sf0001)
    val generic = AsofJoin.backward(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "signup"),
        Seq("user_id"), "ts", "ts", Seq("ts"))
      .select(col("event_id"), col("asof_ts").as("last_signup_ts"))
    val specialized = graft.SparkEntry.queries("q_ev3_asof_last_signup")(spark, sf0001)
      .select(col("event_id"), col("last_signup_ts"))
    assert(generic.orderBy("event_id").collect().toSeq ==
      specialized.orderBy("event_id").collect().toSeq)
  }

  test("reserved internal names and asof_ output collisions are rejected up front") {
    import spark.implicits._
    val left = Seq(("a", 10L, 1)).toDF("sym", "t", "trade_id")
    val right = Seq(("a", 5L, 1.0)).toDF("sym", "t", "px")
    val badLeft = left.withColumn("__t", org.apache.spark.sql.functions.lit(0L))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.backward(badLeft, right, Seq("sym"), "t", "t", Seq("px"))
    }
    assert(e1.getMessage.contains("__t"))
    val collide = left.withColumn("asof_px", org.apache.spark.sql.functions.lit(0.0))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.backward(collide, right, Seq("sym"), "t", "t", Seq("px"))
    }
    assert(e2.getMessage.contains("asof_px"))
  }
}
