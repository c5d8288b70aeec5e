package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scaled 10× probe of the expensive gate families (SCALING.md).
  *
  * The driver's largest dataset is sf0.1; this synthesizes a ~10×
  * corpus NEXT TO it (builder-side, under /tmp — never touching the
  * driver's testdata): documents and embeddings are unioned 10× with
  * shard-offset ids and a per-shard rewrite that PRESERVES each
  * shard's internal structure while making shards mutually unrelated —
  * every word gets a shard suffix (so cross-shard shingle/MinHash/
  * n-gram similarity collapses to ~0) and embeddings are rotated by k
  * components (cross-shard cosine ≈ random). This keeps the
  * DUPLICATE DENSITY of the 10× corpus equal to sf0.1's: a first
  * attempt that only appended one tag token left the shards as
  * near-duplicates of each other, and the dedup gates "scaled" 26×
  * because the candidate-pair count grew quadratically in the shard
  * count — a correct answer about a 90%-duplicate corpus, but a
  * measurement of the synthetic duplication, not of the operator. All
  * other tables pass through at 1× (noted per gate in the output).
  *
  * Timing per (gate, dir): one warmup execution (JIT + the train-once
  * artifact fill — the same amortization the bench applies), then the
  * min of two timed runs through the noop sink with the cache cleared
  * between runs. The report records the measured exponent
  * log10(t_big/t_sf) — 1.0 = perfectly linear in the scaled tables,
  * < 1 = sublinear (fixed overheads amortizing), > 1 = super-linear
  * (a plan that would NOT survive 100×; each gets a plan fix or a
  * written explanation in SCALING.md).
  *
  * Usage: ScalingProbe <sfDir> <bigDir> <out.md>
  */
object ScalingProbe {

  /** The ten most expensive gates of the round-6 guarded self-bench,
    * plus the round-7 document-table additions (their inputs scale in
    * the synthesized corpus; gates over unscaled tables would measure
    * nothing). SPARK_GRAFT_PROBE_ONLY=q_a,q_b narrows a run. */
  val Gates: Seq[String] = Seq(
    "q_dd8_semantic_dedup", "q_llm1_corpus_curation", "q_dd2_minhash_lsh",
    "q_dd4_ngram_jaccard", "q_dd6_multitable_lsh", "q_llm2_training_export",
    "q_dd10_dup_clusters", "q_dd7_incremental_lsh", "q_dd9_substring_spans",
    "q_dd12_span_removal",
    "q_tx13_novelty", "q_llm3_mix_pipeline", "q_lm7_dsir", "q_dd13_bag_dedup",
    "q_dd14_minhash_audit", "q_dd15_best_keeper", "q_s8_curriculum",
    "q_tx14_vocab_stats",
    "q_ul1_unigram_viterbi", "q_ul2_unigram_em_round",
    "q_dc4_semantic_decontamination",
    "q_mm5_perceptual_dedup")

  /** Gates whose scaled input is the REAL sf0.01 → sf0.1 step: their
    * tables (lineitem / customer / events) pass through the
    * synthesizer at 1×, but grow 10× between the two driver datasets
    * — an equally honest 10× measurement. */
  val RealStepGates: Seq[String] = Seq(
    "q_sp10_hll_registers", "q_sp11_hll_merge", "q_ev7_islands",
    "q_j13_fuzzy_blocked",
    "q_ev8_session_window", "q_cc9_cooccurrence", "q_m5_scd2",
    "q_qa1_expectations", "q_qa2_profile_drift", "q_w6_range_frame",
    "q_fz4_window_setop_fuzz", "q_sp12_quantile_registers",
    "q_sp13_quantile_merge", "q_cc10_communities",
    // round-15: the r14/r15 collation populations (fz28 grew to 48
    // queries, fz32 is new at 42) get decade rows like the older
    // families — orders/customer are the real sf0.01→sf0.1 step
    "q_fz28_collation", "q_fz32_collated_strfuncs")

  val Shards = 10
  private val IdOffset = 10000000L

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--decade2")) {
      decade2(args(1), args(2), args(3), args(4)); return
    }
    if (args.headOption.contains("--decade3")) {
      decade3(args(1), args(2), args(3)); return
    }
    val Array(sfDir, bigDir, outMd) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    synthesize(spark, sfDir, bigDir)

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    def timed(name: String, dir: String): Double = {
      exec(name, dir) // warmup: JIT + train-once artifact fill
      math.min(exec(name, dir), exec(name, dir))
    }

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    val rows = Gates.filter(g => only.forall(_.contains(g))).map { g =>
      val tSf = timed(g, sfDir)
      val tBig = timed(g, bigDir)
      row(g, tSf, tBig)
    }

    // dd8 with the k ∝ N knob applied (the SemDeDup scaling contract:
    // k ≈ N / target-cell-size, so per-cell pair work stays constant):
    // the GATE pins k = 8 at every sf for oracle determinism, which is
    // quadratic in cell size when N grows 10× — this row measures the
    // production configuration instead
    def dd8(dir: String, k: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.SemanticDedup.dedup(spark,
          Tables.embeddings(spark, dir), k, 2, 0.5, 7, 20,
          codebookKey = Some(s"semdedup-probe|$k|$dir"), codebookSrcDir = dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    val kRow = if (only.forall(_.contains("q_dd8_semantic_dedup"))) {
      dd8(bigDir, 80) // warmup + codebook artifact fill
      val tSf = { dd8(sfDir, 8); math.min(dd8(sfDir, 8), dd8(sfDir, 8)) }
      val tBig = math.min(dd8(bigDir, 80), dd8(bigDir, 80))
      Seq(row("q_dd8 with k∝N (8→80)", tSf, tBig))
    } else Seq.empty

    val smallDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_SMALL", "/root/testdata/sf0.01")
    val realRows = RealStepGates.filter(g => only.forall(_.contains(g))).map { g =>
      val tS = timed(g, smallDir)
      val tB = timed(g, sfDir)
      row(s"$g (sf0.01→sf0.1)", tS, tB)
    }

    // graph-family rows: the gates pin a fixed orderkey slice (their
    // input is bounded by the slice, not the table), so the honest 10×
    // knob is the SLICE — same sf0.1 table, 10× the subgraph
    def timedF(build: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      once(); math.min(once(), once())
    }
    def graphEdges(slice: Long, foldParts: Option[Long]): DataFrame = {
      val part = foldParts match {
        case Some(m) => col("l_partkey") % m + 1000000L
        case None => col("l_partkey") + 1000000L
      }
      Tables.lineitem(spark, sfDir).filter(col("l_orderkey") < slice)
        .select(col("l_orderkey").as("a"), part.as("b")).distinct()
    }
    import spark.implicits._
    val graphDefs: Seq[(String, Long => () => DataFrame)] = Seq(
      ("q_cc6 coreness (slice 1k→10k)",
        (s: Long) => () => operators.KCore.coreness(graphEdges(s * 2, Some(100)), "a", "b", 10)),
      ("q_cc7 bfs (slice 500→5k)",
        (s: Long) => () => operators.Bfs.hopDistances(graphEdges(s, None),
          "a", "b", (0L until 10L).toDF("v"), 8)),
      ("q_cc8 trustrank (slice 500→5k)",
        (s: Long) => () => operators.PageRank.trustRanks(
          graphEdges(s, None).withColumnRenamed("a", "src").withColumnRenamed("b", "dst"),
          "src", "dst", (0L until 10L).toDF("v"), 5)))
    val graphRows =
      if (only.isEmpty)
        graphDefs.map { case (label, mk) =>
          val tS = timedF(mk(500L))
          val tB = timedF(mk(5000L))
          row(label, tS, tB)
        }
      else Seq.empty

    // dc4 with the PRODUCTION eval contract: benchmarks are fixed-size
    // — the gate config scales the eval slice 10× with the corpus
    // (both sides grow ⇒ candidate pairs grow quadratically, the dd8
    // pinned-k artifact class); this row holds the eval set at shard
    // 0's slice and scales only the corpus
    val dc4Row = if (only.forall(_.contains("q_dc4_semantic_decontamination"))) {
      def dc4Build(dir: String): () => DataFrame = () => {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        graft.operators.EmbeddingDedup.nearDupAgainstCorpusExact(
            e.filter(col("vec_id") % 10 === 3 && col("vec_id") < IdOffset),
            e.filter(col("vec_id") % 10 =!= 3), 7, 20, 4, 2, 64)
          .groupBy(col("corpus_id")).agg(count(lit(1)).as("n_eval_hits"))
      }
      Seq(row("q_dc4 with fixed eval set (production)",
        timedF(dc4Build(sfDir)), timedF(dc4Build(bigDir))))
    } else Seq.empty

    writeMd(outMd, sfDir, bigDir, rows ++ kRow ++ realRows ++ graphRows ++ dc4Row)
    spark.stop()
  }

  /** Round-11 SECOND decade: ~sf1 → ~sf10 for the heaviest sublinear
    * claims (a 10× step can hide a knee the next decade exposes), the
    * production `registersByPartition` on a MEASURED multi-partition
    * input (both driver SFs fit one input partition, so shard-count =
    * partition-count was spec'd but never measured), cc10 on a 10×
    * lineitem graph (its first decade was the real sf0.01→sf0.1 step),
    * and rule-ON/OFF rows for the two hazard-frame shapes the
    * TailFrameRewrite newly covers.
    *
    * Usage: ScalingProbe --decade2 <sfDir> <bigDir> <big2Dir> <out.md> */
  def decade2(sfDir: String, bigDir: String, big2Dir: String, outMd: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    synthesize(spark, sfDir, bigDir) // decade 1 must exist
    synthesizeDecade2(spark, sfDir, bigDir, big2Dir)

    def once(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    def timedF(build: () => DataFrame): Double = {
      once(build); math.min(once(build), once(build))
    }
    def gate(name: String, dir: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, dir)

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    def want(g: String) = only.forall(_.contains(g))

    var rows = Seq.empty[(String, Double, Double, Double, Double)]
    if (want("q_dd4_ngram_jaccard"))
      rows :+= row("q_dd4_ngram_jaccard (~sf1→~sf10)",
        timedF(gate("q_dd4_ngram_jaccard", bigDir)),
        timedF(gate("q_dd4_ngram_jaccard", big2Dir)))
    if (want("q_mm5_perceptual_dedup"))
      rows :+= row("q_mm5_perceptual_dedup (~sf1→~sf10)",
        timedF(gate("q_mm5_perceptual_dedup", bigDir)),
        timedF(gate("q_mm5_perceptual_dedup", big2Dir)))
    if (want("q_dd8_semantic_dedup")) {
      // the production k ∝ N knob at the second decade: 80 → 800
      def dd8(dir: String, k: Int): () => DataFrame = () =>
        graft.operators.SemanticDedup.dedup(spark,
          Tables.embeddings(spark, dir), k, 2, 0.5, 7, 20,
          codebookKey = Some(s"semdedup-probe2|$k|$dir"), codebookSrcDir = dir)
      rows :+= row("q_dd8 with k∝N (80→800, ~sf1→~sf10)",
        timedF(dd8(bigDir, 80)), timedF(dd8(big2Dir, 800)))
    }
    if (want("q_cc10_communities"))
      rows :+= row("q_cc10_communities (lineitem 1×→10×)",
        timedF(gate("q_cc10_communities", sfDir)),
        timedF(gate("q_cc10_communities", big2Dir)))

    // production registersByPartition on a MULTI-partition input:
    // cap maxPartitionBytes so the 10× lineitem really splits, and
    // record shard-count = partition-count alongside the timing
    if (want("registersByPartition")) {
      val mpbKey = "spark.sql.files.maxPartitionBytes"
      val oldMpb = spark.conf.get(mpbKey)
      spark.conf.set(mpbKey, (4L * 1024 * 1024).toString) // 4 MB splits
      def regs(dir: String): DataFrame = {
        val li = Tables.lineitem(spark, dir)
          .select((col("l_orderkey") * 8 + col("l_linenumber")).as("uk"),
            col("l_partkey").as("q0"))
        graft.operators.QuantileRegister.registersByPartition(
          li, valueCol = "q0", tieCols = Seq("uk"), k = 64L)
      }
      // shard-count = NON-EMPTY partition count: byte-range splitting
      // can plan more chunks than a file has row groups (a row group
      // lands in the chunk holding its midpoint; the other chunks scan
      // zero rows), and empty partitions contribute no registers —
      // the honest invariant is over partitions that carry rows
      def partsAndShards(dir: String): (Int, Long, Long) = {
        val li = Tables.lineitem(spark, dir)
          .select((col("l_orderkey") * 8 + col("l_linenumber")).as("uk"),
            col("l_partkey").as("q0"))
        val planned = li.rdd.getNumPartitions // probe-only introspection
        val nonEmpty = li.select(spark_partition_id().as("p"))
          .agg(countDistinct(col("p"))).head().getLong(0)
        val nShards = regs(dir).select(countDistinct(col("shard"))).head().getLong(0)
        (planned, nonEmpty, nShards)
      }
      try {
        val (p1, ne1, s1) = partsAndShards(sfDir)
        val (p2, ne2, s2) = partsAndShards(big2Dir)
        println(s"[scaling] registersByPartition shards: sf=$s1 (of $ne1 non-empty/$p1 planned), " +
          s"big2=$s2 (of $ne2 non-empty/$p2 planned)")
        require(s1 == ne1 && s2 == ne2,
          s"shard-count must equal non-empty-partition count: ($s1,$ne1) ($s2,$ne2)")
        require(s2 > 1, s"big2 input must be genuinely multi-partition, got $s2")
        rows :+= row(s"registersByPartition (lineitem 1×/$ne1 shards→10×/$ne2 shards)",
          timedF(() => regs(sfDir)), timedF(() => regs(big2Dir)))
      } finally spark.conf.set(mpbKey, oldMpb)
    }

    // rule-ON/OFF rows for the newly covered hazard shapes (sf0.1):
    // these record the measured win, not a 10× exponent. Sum children
    // are INT-cast: under ANSI (default) the rule only rewrites sums
    // with Long-buffer overflow headroom — a bare Long sum would make
    // both arms quadratic and measure nothing.
    if (want("tailframe")) {
      val key = graft.plans.TailFrameRewrite.ConfKey
      def hazard(sqlText: String): () => DataFrame = () => {
        Tables.orders(spark, sfDir).createOrReplaceTempView("__probe_orders")
        spark.sql(sqlText)
      }
      val kFollowing = """SELECT o_orderkey,
        CAST(sum(CAST(o_custkey % 100 AS INT)) OVER (PARTITION BY o_orderstatus
          ORDER BY o_custkey, o_orderkey
          ROWS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT) AS s
        FROM __probe_orders"""
      val interval = """SELECT o_orderkey,
        CAST(sum(CAST(o_custkey % 100 AS INT)) OVER (PARTITION BY o_orderstatus
          ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS s
        FROM __probe_orders"""
      for ((label, q) <- Seq(("k-FOLLOWING ROWS hazard", kFollowing),
          ("interval RANGE hazard", interval))) {
        val tOn = timedF(hazard(q))
        spark.conf.set(key, "false")
        val tOff = try timedF(hazard(q)) finally spark.conf.set(key, "true")
        // (label, ON, OFF, speedup, log10) — reuse the row shape
        rows :+= row(s"TailFrameRewrite $label (sf0.1, ON→OFF)", tOn, tOff)
      }
    }

    writeMd(outMd, bigDir, big2Dir, rows)
    spark.stop()
  }

  /** documents+embeddings ~sf1 → ~sf10 (10 more mutually-unrelated
    * shards of the decade-1 corpus: per-word second-level suffix,
    * second rotation, disjoint id band) and lineitem sfDir → 10×
    * (shard-offset keys — disjoint subgraphs with sf0.1's exact
    * per-shard structure, the cc10-honest scaling). Idempotent via
    * marker. */
  def synthesizeDecade2(spark: SparkSession, sfDir: String, bigDir: String,
      big2Dir: String): Unit = {
    val marker = java.nio.file.Paths.get(big2Dir, "_SYNTH_COMPLETE")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(big2Dir))
    val Off2 = 1000000000L

    val docs = spark.read.parquet(s"$bigDir/documents.parquet")
    (0 until Shards).map { k =>
      val text =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"~$k"))), " ")
      docs.select((col("doc_id") + lit(k * Off2)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$big2Dir/documents.parquet")

    val emb = spark.read.parquet(s"$bigDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until Shards).map { k =>
      val rot = (k * 17) % dim // co-prime-ish stride past the decade-1 rotations
      val rotated =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      emb.select((col("vec_id") + lit(k * Off2)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$big2Dir/embeddings.parquet")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (0 until Shards).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * IdOffset))
        .withColumn("l_partkey", col("l_partkey") + lit(k * IdOffset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * IdOffset))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$big2Dir/lineitem.parquet")

    java.nio.file.Files.writeString(marker, s"from $bigDir x$Shards + lineitem $sfDir x$Shards\n")
  }

  /** Round-12 THIRD scaling step, dd4 only (the VERDICT stretch): the
    * measured exponent drifted 0.70 → 0.83 across the first two
    * decades — the fixed-cost-amortization model predicts it keeps
    * drifting toward (never past) 1.0; another step either confirms
    * that or exposes a knee. A full ~sf100 decade was ATTEMPTED and
    * is disk-infeasible in this sandbox: dd4's banded-join shuffle
    * at ~sf100 exceeded the box's 78 GB free disk in spill six
    * minutes into the first execution (the shuffle volume itself is
    * linear in the corpus — on a real cluster it spreads across
    * executor-local disks; the single-box limit is a sandbox
    * artifact, recorded in SCALING.md). This probe therefore takes a
    * disk-feasible 2× step instead (10×/5×/3× all spilled past the
    * disk, the 3× on a CLEAN /tmp — single-execution spill measures
    * ≈25 GB at ~sf10 and >75 GB at ~sf30, i.e. ~linear shuffle
    * volume, itself evidence against a candidate-pair knee; orphaned
    * blockmgr dirs from crashed probe JVMs must be rm'd before a
    * run): 2 mutually-unrelated shards of
    * the decade-2 corpus (third-level word suffix, disjoint id band —
    * the same duplicate-density-preserving construction), measuring
    * dd4 at ~sf10 → ~sf20 with the exponent normalized by log(2).
    *
    * Usage: ScalingProbe --decade3 <big2Dir> <big3Dir> <out.md> */
  def decade3(big2Dir: String, big3Dir: String, outMd: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val Step = 2
    val marker = java.nio.file.Paths.get(big3Dir, "_SYNTH_COMPLETE_X2")
    if (!java.nio.file.Files.exists(marker)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(big3Dir))
      val Off3 = 100000000000L
      val docs = spark.read.parquet(s"$big2Dir/documents.parquet")
      (0 until Step).map { k =>
        val text =
          if (k == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s".$k"))), " ")
        docs.select((col("doc_id") + lit(k * Off3)).as("doc_id"), text.as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$big3Dir/documents.parquet")
      java.nio.file.Files.writeString(marker, s"from $big2Dir x$Step (documents only)\n")
    }

    def once(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // finished-shuffle files are dropped by the ContextCleaner only
      // after the shuffle objects are GC'd — at this corpus size the
      // lingering spill of earlier runs is what filled the disk
      System.gc()
      Thread.sleep(3000)
      t
    }
    def timedF(build: () => DataFrame): Double = {
      once(build); math.min(once(build), once(build))
    }
    def gate(dir: String): () => DataFrame =
      () => SparkEntry.queries("q_dd4_ngram_jaccard")(spark, dir)

    val tA = timedF(gate(big2Dir))
    val tB = timedF(gate(big3Dir))
    val r = row(s"q_dd4_ngram_jaccard (~sf10→~sf20, 2× step)", tA, tB)
    println(f"[scaling] dd4 2x-step exponent (log2 ratio) = ${math.log(tB / tA) / math.log(2)}%.2f")
    writeMd(outMd, big2Dir, big3Dir, Seq(r))
    spark.stop()
  }

  private def row(g: String, tSf: Double, tBig: Double) = {
    val ratio = tBig / tSf
    val exp = math.log10(ratio)
    println(f"[scaling] $g%-28s sf=$tSf%6.2fs big=$tBig%7.2fs ratio=$ratio%5.2f exp=$exp%4.2f")
    (g, tSf, tBig, ratio, exp)
  }

  /** 10× documents + embeddings, 1× passthrough for everything else.
    * Idempotent via a marker file. */
  def synthesize(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    val marker = java.nio.file.Paths.get(bigDir, "_SYNTH_COMPLETE")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bigDir))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until Shards).map { k =>
      // per-word shard suffix: shard k's vocabulary is disjoint from
      // every other shard's, so cross-shard similarity is zero while
      // within-shard token structure (lengths, repetitions, dup pairs)
      // is exactly sf0.1's
      val text =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$k"))), " ")
      docs.select(
        (col("doc_id") + lit(k * IdOffset)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until Shards).map { k =>
      // rotate components by k: each shard keeps sf0.1's exact
      // geometry internally; cross-shard cosine decorrelates
      val rotated =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      emb.select(
        (col("vec_id") + lit(k * IdOffset)).as("vec_id"),
        rotated.as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")

    val scaled = Set("documents.parquet", "embeddings.parquet")
    java.nio.file.Files.list(java.nio.file.Paths.get(sfDir)).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !scaled(n))
        spark.read.parquet(p.toString).write.mode("overwrite").parquet(s"$bigDir/$n")
    }
    java.nio.file.Files.writeString(marker, s"from $sfDir x$Shards\n")
  }

  private def writeMd(path: String, sfDir: String, bigDir: String,
      rows: Seq[(String, Double, Double, Double, Double)]): Unit = {
    val load = try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim catch { case _: Exception => "?" }
    val sb = new StringBuilder
    // a SECTION fragment — appended to SCALING.md by hand with the
    // per-gate explanations, never overwriting the living document
    sb.append("## Measured 10x self-scaled probe (round 8)\n\n")
    sb.append(s"Source: `$sfDir` -> synthesized `$bigDir` ")
    sb.append(s"($Shards near-duplicate-free shards of documents+embeddings; ")
    sb.append("all other tables 1x passthrough). Timing: warmup + min of 2, ")
    sb.append("noop sink, cache cleared per run, local[32]. ")
    sb.append(s"Post-run loadavg: `$load`.\n\n")
    sb.append("Measured exponent = log10(t_10x / t_1x): 1.0 = linear in the ")
    sb.append("scaled tables, <1 sublinear, >1 super-linear (needs a plan fix ")
    sb.append("or an explanation below).\n\n")
    sb.append("| gate | t(sf0.1) s | t(~sf1) s | ratio | exponent |\n")
    sb.append("|---|---|---|---|---|\n")
    rows.foreach { case (g, a, b, r, e) =>
      sb.append(f"| $g | $a%.2f | $b%.2f | $r%.2f | $e%.2f |\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
