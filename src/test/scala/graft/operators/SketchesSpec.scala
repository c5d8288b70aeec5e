package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import Sketches._
  import spark.implicits._

  private val K = 64

  test("KmvAgg keeps a sorted, distinct, k-bounded buffer under reduce") {
    val agg = new KmvAgg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L).foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    assert(buf.toSeq == Seq(1L, 2L, 3L, 7L)) // 4 smallest, duplicates dropped
    // inserting something above the current max is a no-op
    assert(agg.reduce(buf, 100L).toSeq == Seq(1L, 2L, 3L, 7L))
  }

  test("KmvAgg.merge equals sketching the union (the distributive law)") {
    val agg = new KmvAgg(8)
    val xs = (1 to 200).map(i => (i * 2654435761L) & 0xFFFFFFFFL)
    val (a, b) = xs.splitAt(120)
    val skA = a.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val skB = b.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val direct = xs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    assert(agg.merge(skA, skB).toSeq == direct.toSeq)
    assert(agg.merge(skB, skA).toSeq == direct.toSeq) // commutative
    assert(agg.merge(direct, agg.zero).toSeq == direct.toSeq)
  }

  test("KMV estimate is within 25% of truth at 10k distinct keys") {
    val n = 10000
    val est = (1 to n).toDF("id")
      .select(md5Long56(concat(lit("x:"), $"id".cast("string"))).as("h"))
      .agg(kmvSketch(K)($"h").as("__kmv_sk"))
      .select(kmvEstimate("__kmv_sk", K).as("est"))
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.25, s"estimate $est vs $n")
  }

  test("KMV sketch aggregation partial-merges (ObjectHashAggregate, two-phase)") {
    val df = (1 to 1000).toDF("id")
      .select((($"id" % 7)).as("g"), md5Long56($"id".cast("string")).as("h"))
      .groupBy($"g").agg(kmvSketch(K)($"h").as("sk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"sketch agg must hash-aggregate:\n$p")
    // partial + final = the sketch combines map-side before the shuffle
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"sketch agg must be two-phase:\n$p")
  }

  test("CMS estimate is an upper bound and exact without collisions") {
    val words = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(3)("gamma") ++
      (1 to 30).map(i => s"noise$i")
    val df = words.toDF("word")
    val cells = cmsCells(df, "word", 4, 1024)
    assert(cells.agg(sum($"cnt")).as[Long].head() == 4L * words.size) // mass law
    val probes = Seq("alpha", "beta", "gamma").toDF("word")
    val est = cmsEstimate(probes, "word", cells, 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 50 && est("beta") >= 20 && est("gamma") >= 3)
    // 103 distinct keys in 1024 buckets × 4 rows: a key colliding in
    // ALL 4 rows is vanishingly unlikely — the min is exact here
    assert(est == Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 3L))
  }

  test("CMS probe of an absent key estimates 0 (no phantom counts)") {
    val cells = cmsCells(Seq("a", "b", "c").toDF("word"), "word", 4, 1024)
    val est = cmsEstimate(Seq("zzz-absent").toDF("word"), "word", cells, 4, 1024)
      .select($"est").as[Long].head()
    assert(est == 0L)
  }

  test("KmvAgg skips null inputs (SQL distinct-null semantics)") {
    val agg = new KmvAgg(4)
    val buf = agg.reduce(agg.reduce(agg.zero, 5L), null)
    assert(buf.toSeq == Seq(5L))
    // end-to-end: a null-valued column contributes nothing
    val est = Seq(Some(1L), None, Some(2L), None).toDF("v")
      .select(when($"v".isNotNull, md5Long56($"v".cast("string"))).as("h"))
      .agg(kmvSketch(4)($"h").as("__kmv_sk"))
      .select(kmvEstimate("__kmv_sk", 4).as("est")).as[Long].head()
    assert(est == 2L)
  }

  test("q_sp5 profile runs one scan of orders (checkpointed agg row, not 3 passes)") {
    val df = graft.SparkEntry.queries("q_sp5_table_profile")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"), // union reads the checkpointed row only
      s"profile unpivot must not rescan the table:\n$p")
  }

  test("KMV overlap estimates track the true intersection (no join ever runs)") {
    // A = 1..6000, B = 4001..10000: |A∪B| = 10000, |A∩B| = 2000
    def side(r: Range, name: String) = r.toDF("id")
      .select(md5Long56(concat(lit("t:"), $"id".cast("string"))).as("h"))
      .agg(kmvSketch(K)($"h").as(name))
    val df = side(1 to 6000, "sk0").crossJoin(side(4001 to 10000, "sk1"))
      .withColumn("__kmv_sk", kmvMerge($"sk0", $"sk1", K))
      .withColumn("__theta", element_at($"__kmv_sk", K))
      .select(
        size(filter(array_intersect($"sk0", $"sk1"), x => x < $"__theta")).as("c"),
        kmvEstimate("__kmv_sk", K).as("u"))
    val r = df.head()
    val (c, u) = (r.getInt(0), r.getLong(1))
    val interEst = c.toLong * u / (K - 1) // samples strictly below theta
    assert(math.abs(u - 10000.0) / 10000 < 0.3, s"union est $u")
    // intersection carries sampling error from both sketches — wide band
    assert(interEst > 500 && interEst < 4500, s"intersection est $interEst (true 2000)")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), "set arithmetic must not shuffle-join")
  }

  test("Misra-Gries guarantee holds under adversarial orders and merging") {
    val k = 4
    val agg = new MgAgg(k)
    // 100 'hot' (40%), 60 'warm' (24%), 90 singletons: both named keys
    // exceed N/(k+1) = 50 and MUST survive any processing order
    val stream = Seq.fill(100)("hot") ++ Seq.fill(60)("warm") ++
      (1 to 90).map(i => s"cold$i")
    val n = stream.size
    for (seed <- 1 to 5) {
      val shuffled = new scala.util.Random(seed).shuffle(stream)
      val (a, b) = shuffled.splitAt(n / 2)
      def run(xs: Seq[String]) = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(run(a), run(b))
      assert(merged.size <= k)
      assert(merged.contains("hot") && merged.contains("warm"),
        s"true heavies must survive (seed $seed): $merged")
      // undercount bound: true - N/(k+1) <= counter <= true
      assert(merged("hot") <= 100 && merged("hot") >= 100 - n / (k + 1))
      assert(merged("warm") <= 60 && merged("warm") >= 60 - n / (k + 1))
    }
  }

  test("heavyHitters output is exactly the keys above N/(k+1), order-free") {
    val words = (Seq.fill(30)("x") ++ Seq.fill(20)("y") ++
      (1 to 50).map(i => s"z$i")).toDF("word") // N=100, threshold N/5=20
    val out = heavyHitters(words.repartition(7), "word", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 30L)) // y is at exactly 20, not strictly above
  }

  test("bloom filter: zero false negatives, map-side probe, build is word-bounded") {
    val keys = (1 to 500).map(i => s"k$i").toDF("k")
    val bits = bloomBits(keys, "k", 4)
    assert(bits.count() <= BloomBits / 32) // at most m/32 words whatever n is
    val probe = (1 to 2000).map(i => s"k$i").toDF("k")
    val passed = bloomMightContain(probe, "k", bits, 4)
      .select($"k").as[String].collect().toSet
    // every true member passes — false negatives are impossible
    assert((1 to 500).forall(i => passed.contains(s"k$i")))
    // false positives exist but are rare at this load factor
    val fp = passed.count(k => k.drop(1).toInt > 500)
    assert(fp < 100, s"fp rate too high: $fp/1500")
    val p = bloomMightContain(probe, "k", bits, 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"bloom probe must be broadcast-only:\n$p")
  }

  test("kmv_sketch is registered for spark.sql users") {
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("kmv_reg_probe")
    val sk = spark.sql(
      "SELECT kmv_sketch(v) AS sk FROM kmv_reg_probe")
      .head().getSeq[Long](0)
    assert(sk.sorted == sk && sk.size == 3)
  }

  test("md5Long56 matches the oracle's digit-sum decode") {
    // the Spark side uses conv(); the DuckDB side a literal-weight
    // digit sum — pin the two agree on a round-trippable value
    val h = Seq("probe").toDF("s").select(md5Long56($"s").as("h")).as[Long].head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("probe".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(14)
    assert(h == java.lang.Long.parseLong(hex, 16))
    assert(h >= 0 && h < HashSpace)
  }

  test("sp9 sliding windows: below sketch saturation the estimate IS the exact distinct") {
    // at sf0.001 every 6-hour window holds far fewer than K=64 distinct
    // users, so the KMV estimate degrades to the exact union count —
    // the sliding pipeline must therefore match a brute-force
    // window-by-window distinct over the raw events
    val out = graft.SparkEntry.queries("q_sp9_kmv_sliding")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .selectExpr("unix_micros(ts) div 3600000000 as hr", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hours = ev.map(_._1).distinct
    val exact = hours.map { h =>
      h -> ev.filter(e => e._1 >= h - 5 && e._1 <= h).map(_._2).distinct.length.toLong
    }.toMap
    assert(out.keySet == exact.keySet)
    val saturated = out.count(_._2 >= K)
    assert(saturated == 0, s"test premise: sf0.001 windows must stay under K, got $saturated at/over")
    assert(out == exact, "unsaturated sliding KMV must equal exact sliding distinct")
  }

  // ---------------- HyperLogLog ----------------

  /** JVM reference for (bucket, rho): independent md5 + bit math. */
  private def refBucketRho(key: String): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
    val w = h >> 6
    val rho = if (w == 0L) 51L else 51L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (h % 64, rho)
  }

  test("HLL registers: frame computation == JVM bit-math reference") {
    val keys = (1 to 500).map(i => s"p:$i")
    val df = keys.toDF("k")
    val got = hllRegisters(df, col("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = keys.map(refBucketRho)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val full = (0L until 64L).map(b => b -> ref.getOrElse(b, 0L)).toMap
    assert(got == full)
  }

  test("HLL merge law: registers(A ++ B) == per-bucket max of shard registers") {
    val a = (1 to 300).map(i => s"x:$i").toDF("k")
    val b = (200 to 600).map(i => s"x:$i").toDF("k") // overlapping shards
    val whole = hllRegisters(a.unionAll(b), col("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ra = hllRegisters(a, col("k")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rb = hllRegisters(b, col("k")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (0L until 64L).map(bk => bk -> math.max(ra(bk), rb(bk))).toMap
    assert(whole == merged)
  }

  test("HLL estimate from the integer registers lands near the true cardinality") {
    // downstream float math over the 64 exact registers: the harmonic
    // sum Σ 2^(Rmax−r) is an exact BIGINT; only α and the division are
    // float. m=64 → σ ≈ 1.04/√64 = 13%; the data and hash are fixed, so
    // this is a deterministic number, asserted within 2σ of truth.
    val n = 5000
    val df = (1 to n).map(i => s"c:$i").toDF("k")
    val regs = hllRegisters(df, col("k")).collect().map(r => r.getLong(1))
    val rmax = regs.max
    val harmonic = regs.map(r => 1L << (rmax - r)).sum // exact integer
    val est = 0.709 * 64.0 * 64.0 * math.pow(2.0, rmax.toDouble) / harmonic.toDouble
    assert(math.abs(est - n) / n < 0.26, s"estimate $est vs true $n")
  }

  test("quantile registers: bounded size, exact rank bound at EVERY distinct value, merge = union") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf0001)
    val reg = graft.SparkEntry.queries("q_sp12_quantile_registers")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // bounded-model contract: every shard register holds at most K rows
    val perShard = reg.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perShard.values.forall(_ <= 64), s"register over capacity: $perShard")

    // the integer rank bound, exhaustively: for every distinct q value,
    // weighted register count over q <= x must land in
    // [true_count, true_count + sum(stride_i - 1)]
    val trueCounts = li.select(floor(col("l_quantity")).cast("long").as("q"))
      .groupBy("q").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bound = reg.groupBy(_._1).map(_._2.map(_._4).max - 1).sum
    var cum = 0L
    trueCounts.foreach { case (x, c) =>
      cum += c
      val est = reg.filter(_._3 <= x).map(_._4).sum
      assert(est >= cum && est <= cum + bound,
        s"x=$x: est $est outside [$cum, ${cum + bound}] (bound $bound)")
    }

    // quantile extraction from the merged register: value at the p-th
    // weighted rank has true rank within bound + max stride of target
    val n = trueCounts.map(_._2).sum
    val totalW = reg.map(_._4).sum
    val maxStride = reg.map(_._4).max
    val sortedReg = reg.sortBy(r => (r._3, r._1, r._2)) // by value
    for (p <- Seq(10, 25, 50, 75, 90)) {
      val target = totalW * p / 100
      var acc = 0L
      val qv = sortedReg.find { r => acc += r._4; acc >= target }.map(_._3).get
      val trueRankLo = trueCounts.takeWhile(_._1 < qv).map(_._2).sum
      val trueRankHi = trueRankLo + trueCounts.find(_._1 == qv).map(_._2).getOrElse(0L)
      val wantRank = n * p / 100
      assert(wantRank >= trueRankLo - bound - maxStride &&
        wantRank <= trueRankHi + bound + maxStride,
        s"p$p: value $qv spans ranks [$trueRankLo,$trueRankHi], target $wantRank, slack ${bound + maxStride}")
    }

    // merge law: the merged estimate used by sp13 is literally the
    // union of shard registers -- re-grouping shards changes nothing
    val regrouped = reg.groupBy(t => t._1 % 2).values.flatten.toSeq.sorted
    assert(regrouped == reg.toSeq.sorted)
  }

  test("sp14 quantile extraction lands within the register bound of the exact percentile") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf0001)
      .select(floor(col("l_quantity")).cast("long").as("q"))
    val n = li.count()
    val sorted = li.orderBy("q").collect().map(_.getLong(0))
    val reg = graft.SparkEntry.queries("q_sp12_quantile_registers")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val slack = reg.groupBy(_._1).map(_._2.map(_._2).max - 1).sum + reg.map(_._2).max
    val est = graft.SparkEntry.queries("q_sp14_quantile_extract")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((p, v) <- est) {
      // the exact rank span of the reported value must intersect the
      // target-rank window widened by the register slack
      val lo = sorted.indexWhere(_ == v) + 1
      val hi = sorted.lastIndexWhere(_ == v) + 1
      assert(lo >= 1, s"p$p: value $v not present in the column")
      val target = n * p / 100
      assert(target >= lo - slack && target <= hi + slack,
        s"p$p: value $v spans exact ranks [$lo,$hi], target $target, slack $slack")
    }
  }

  test("sp15 grouped quantiles land within each group's own register bound") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag").as("grp"), floor(col("l_quantity")).cast("long").as("q"))
    val byGrp = li.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val est = graft.SparkEntry.queries("q_sp15_grouped_quantiles")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.map(_._1).toSet == byGrp.keySet, "every group answered")
    // per-group slack from the ACTUAL per-(grp, shard) counts (the
    // gate's stride rule replayed exactly, robust to data regeneration)
    val shardCounts = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag").as("g"), (col("l_suppkey") % 4).as("sh"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    for ((g, p, v) <- est) {
      val sorted = byGrp(g)
      val n = sorted.length
      val strides = shardCounts(g).map { ns =>
        val m = (ns + 63) / 64
        if (m <= 1) 1L else java.lang.Long.highestOneBit(m - 1) * 2
      }.toSeq
      val slack = strides.map(_ - 1).sum + strides.max
      val lo = sorted.indexWhere(_ == v) + 1
      val hi = sorted.lastIndexWhere(_ == v) + 1
      assert(lo >= 1, s"$g p$p: value $v absent from group")
      val target = n.toLong * p / 100
      assert(target >= lo - slack && target <= hi + slack,
        s"$g p$p: value $v spans [$lo,$hi], target $target, slack $slack")
    }
  }
}
