package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("deterministic sample: reproducible, monotone in rate, roughly proportional") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(13), "id", 0.3).as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val wider = Sampling.deterministicSample(df, "id", 0.6).as[Long].collect().toSet
    assert(a.subsetOf(wider), "raising the rate must only add rows")
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.05, s"got ${a.size}")
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 4000)
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
  }

  test("grown corpus keeps previously selected rows (incremental consistency)") {
    import spark.implicits._
    val small = (0L until 1000L).toDF("id")
    val grown = (0L until 3000L).toDF("id")
    val s = Sampling.deterministicSample(small, "id", 0.4).as[Long].collect().toSet
    val g = Sampling.deterministicSample(grown, "id", 0.4).as[Long].collect().toSet
    assert(s.subsetOf(g) && g.filter(_ < 1000L) == s)
  }

  test("assignSplits: exhaustive, disjoint, stable under growth, ~proportional") {
    import spark.implicits._
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = (0L until 4000L).toDF("id")
    val s = Sampling.assignSplits(df, "id", fracs)
    val byId = s.as[(Long, String)].collect().toMap
    assert(byId.size == 4000, "every row gets exactly one split")
    val sizes = s.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(sizes("train") - 3200L) < 160, s"got $sizes")
    assert(math.abs(sizes("val") - 400L) < 80, s"got $sizes")
    assert(math.abs(sizes("test") - 400L) < 80, s"got $sizes")
    // growth stability: ids keep their split when the corpus grows
    val grown = Sampling.assignSplits((0L until 8000L).toDF("id"), "id", fracs)
      .as[(Long, String)].collect().toMap
    assert(byId.forall { case (id, sp) => grown(id) == sp })
    // no shuffle: pure projection over the scan
    val exchanges = s.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "split assignment must be map-side only")
  }

  test("epochMix: deterministic repeats, correct expectation, growth-stable") {
    import spark.implicits._
    val df = ((0L until 2000L).map(i => (i, "hi")) ++
      (2000L until 4000L).map(i => (i, "lo"))).toDF("id", "source")
    val epochs = Map("hi" -> 2.5, "lo" -> 0.25)
    val mixed = Sampling.epochMix(df, "source", "id", epochs, 0.0).cache()
    // repeat indexes are dense 0..reps-1 per id
    val reps = mixed.groupBy("id").agg(count(lit(1)).as("n"), max("rep").as("mx"))
      .as[(Long, Long, Long)].collect()
    assert(reps.forall { case (_, n, mx) => mx == n - 1 })
    val byId = reps.map { case (id, n, _) => id -> n }.toMap
    // per-row count is floor(e) or floor(e)+1; corpus totals ≈ e × n
    assert(byId.filter(_._1 < 2000L).values.forall(n => n == 2L || n == 3L))
    val hiTotal = byId.filter(_._1 < 2000L).values.sum
    val loTotal = byId.filter(_._1 >= 2000L).values.sum
    assert(math.abs(hiTotal - 5000L) < 250, s"got $hiTotal")
    assert(math.abs(loTotal - 500L) < 100, s"got $loTotal")
    // partitioning invariance + growth stability: a doc's repeat count
    // never changes when the corpus is repartitioned or grown
    val re = Sampling.epochMix(df.repartition(17), "source", "id", epochs, 0.0)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(re == byId)
    val grown = Sampling.epochMix(
      df.union(Seq((9999L, "hi")).toDF("id", "source")), "source", "id", epochs, 0.0)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(byId.forall { case (id, n) => grown(id) == n })
    // map-side only: no shuffle anywhere in the plan
    val exchanges = Sampling.epochMix(df, "source", "id", epochs, 0.0)
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.isEmpty, "epoch upsampling must be map-side only")
    mixed.unpersist()
  }

  test("weightedSample: zero weights never win; heavy items dominate per the race odds") {
    import spark.implicits._
    // 200 heavy (w=20) + 200 light (w=1) + 50 zero-weight items
    val df = ((0L until 200L).map(i => (i, 20L)) ++
      (200L until 400L).map(i => (i, 1L)) ++
      (400L until 450L).map(i => (i, 0L))).toDF("id", "w")
    val winners = Sampling.weightedSample(df, "id", $"w", 40)
      .select($"id").as[Long].collect()
    assert(winners.length == 40)
    assert(winners.forall(_ < 400L), "zero-weight items must never sample")
    // expected heavy share 20/21 ≈ 95%; md5 determinism makes the
    // actual count a fixed number — assert it clears a loose bound
    val heavy = winners.count(_ < 200L)
    assert(heavy >= 30, s"heavy items won only $heavy/40")
    // determinism: the draw is a pure function of ids and weights
    val again = Sampling.weightedSample(df, "id", $"w", 40)
      .select($"id").as[Long].collect()
    assert(winners.toSeq == again.toSeq)
  }

  test("weightedSample race keys equal the brute-force min-ticket computation") {
    import spark.implicits._
    val df = Seq((1L, 3L), (2L, 1L)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", $"w", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == (0 until 3).map(r => md5hex(s"ws:1:$r")).min)
    assert(got(2L) == md5hex("ws:2:0"))
  }

  test("ratesForShares hits target sizes within hash-gate tolerance") {
    import spark.implicits._
    val df = ((0L until 2000L).map(i => (i, "big")) ++
      (2000L until 2400L).map(i => (i, "small"))).toDF("id", "source")
    val rates = Sampling.ratesForShares(df, "source",
      Map("big" -> 0.5, "small" -> 0.5), totalTarget = 600)
    assert(rates("big") == 0.15 && rates("small") == 0.75) // 300/2000, 300/400
    val mixed = Sampling.mixBySourceRates(df, "source", "id", rates, 0.0)
    val bySource = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySource("big") - 300L) < 60, s"got $bySource")
    assert(math.abs(bySource("small") - 300L) < 60, s"got $bySource")
  }

  test("temperatureMix: banded rank ≡ naive per-source window, bit-equal") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(df, "source", "doc_id", 300L)
    val naive = df
      .withColumn("__key", Sampling.hashGate(col("doc_id")))
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("__key"), col("doc_id"))).cast("long") - 1L)
      .select(col("doc_id"), col("r"))
    val diff = out.join(naive, Seq("doc_id"))
      .filter(col("src_rank") =!= col("r")).count()
    assert(diff == 0L, "two-level per-group rank must equal the window rank")
  }

  test("temperatureMix: alpha=1/2 flattens the head; quotas exact; repartition-stable") {
    import spark.implicits._
    // 900 vs 100 docs → weights floor(sqrt) = 30 vs 10, quotas at
    // budget 300: big (300·30) div 40 = 225, small (300·10) div 40 = 75
    // — the small source gets 25% of the budget from 10% of the corpus.
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(df, "source", "doc_id", 300L).cache()
    val quotas = out.groupBy("source").agg(max("quota")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas == Map("big" -> 225L, "small" -> 75L), s"got $quotas")
    val sel = out.filter(col("selected") === 1L).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel == quotas, "each source fills exactly its quota")
    val re = Sampling.temperatureMix(df.repartition(13), "source", "doc_id", 300L)
      .filter(col("selected") === 1L).select("doc_id").as[Long].collect().toSet
    val first = out.filter(col("selected") === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(re == first, "selection must not depend on partitioning")
    out.unpersist()
  }

  test("curriculumSchedule: stages are difficulty-ordered, balanced, repartition-stable") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, (i * 7) % 97)).toDF("doc_id", "diff")
    val out = Sampling.curriculumSchedule(df, "doc_id", col("diff"), 4).cache()
    // rank-quartile stages: 100 docs each
    val sizes = out.groupBy("stage").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(0L -> 100L, 1L -> 100L, 2L -> 100L, 3L -> 100L), s"got $sizes")
    // easy-to-hard: every doc in stage k is no harder than any in k+1
    val bounds = out.groupBy("stage")
      .agg(min("difficulty").as("lo"), max("difficulty").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (k <- 0L to 2L)
      assert(bounds(k)._2 <= bounds(k + 1)._1,
        s"stage $k max ${bounds(k)._2} must not exceed stage ${k + 1} min ${bounds(k + 1)._1}")
    // within-stage positions are a 0-based permutation
    val pos = out.filter(col("stage") === 0L).select("stage_pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until 100L))
    // partitioning never changes the schedule
    val re = Sampling.curriculumSchedule(df.repartition(13), "doc_id", col("diff"), 4)
      .collect().map(_.toSeq).toSet
    assert(re == out.collect().map(_.toSeq).toSet)
    out.unpersist()
  }
}
