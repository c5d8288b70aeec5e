package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable sketches — the bounded-memory cardinality / frequency
  * operators a 100 TB engine needs when exact distinct-counting would
  * shuffle billions of keys.
  *
  * Two classic sketches, both built md5-deterministic so any engine
  * reproduces them bit-for-bit (same discipline as the LSH gates):
  *
  *  - KMV (k-minimum-values) distinct-count estimation
  *    (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  *    stream"): keep the k smallest distinct hash values; with the
  *    hash uniform on [0, 2^56), E[distinct] ≈ (k-1)·2^56 / h_(k).
  *    The sketch is a bounded sorted array, merged by "union, keep k
  *    smallest" — a classic commutative monoid, so Spark evaluates it
  *    as a two-phase ObjectHashAggregate: partial sketches combine
  *    map-side and only (group, k·8 bytes) rows ever shuffle. The
  *    estimate itself is INTEGER-EXACT: floor((k-1)·2^56 / h_(k)) in
  *    BIGINT division, so the DuckDB oracle (which ranks the full
  *    distinct set — fine at gate scale) must match hash-for-hash.
  *
  *  - Count-min sketch frequency estimation (Cormode & Muthukrishnan
  *    2005): d independent hash rows × w buckets of additive counters;
  *    est(key) = min_j cell(j, bucket_j(key)) ≥ true count. The build
  *    is one map-side-combinable groupBy to a FIXED d·w cells — the
  *    sketch of a 100 TB corpus is still 4096 rows, so the probe join
  *    broadcasts the sketch no matter how large the input was.
  *
  * The reference has no sketch operators (its scale never needed
  * them); these are part of the beyond-the-reference large-scale
  * toolkit, like the dedup/ANN families.
  */
object Sketches {

  /** Hash width: 14 hex chars = 56 bits, so (k-1)·2^56 stays inside
    * BIGINT for k ≤ 128 and digit-weight sums are exact in any engine. */
  private val HexChars = 14
  val HashSpace: Long = 1L << (4 * HexChars)

  /** 56-bit non-negative integer hash of a string column: the first 14
    * hex chars of md5, base-16-decoded. `conv` is exact here (≤ 2^56 <
    * 2^63). Deterministic and engine-reproducible. */
  def md5Long56(s: Column): Column =
    conv(substring(md5(s), 1, HexChars), 16, 10).cast(LongType)

  /** The DuckDB twin of [[md5Long56]]: DuckDB has no base-16 string
    * decode, so the generated SQL decodes digit-by-digit with literal
    * BIGINT place weights (exact — every term and the sum < 2^56). */
  def md5Long56Sql(sqlExpr: String): String = {
    val digits = (0 until HexChars).map { i =>
      val weight = 1L << (4 * (HexChars - 1 - i))
      s"(strpos('0123456789abcdef', substring(md5($sqlExpr), ${i + 1}, 1)) - 1) * $weight"
    }
    s"(${digits.mkString(" + ")})"
  }

  /** Bounded k-minimum-values buffer: a sorted array of at most k
    * distinct hashes. reduce/merge keep the invariant; both are
    * allocation-light (binary search + arraycopy). */
  final class KmvAgg(k: Int) extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] = {
      if (boxed == null) return buf // null values carry no identity
      val h = boxed.longValue()
      val idx = java.util.Arrays.binarySearch(buf, h)
      if (idx >= 0) buf // already in the sketch
      else {
        val ins = -idx - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins >= k) buf // above the current k-th minimum
        else {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV sketch as an aggregate column over a 56-bit hash column.
    * Null hashes (null source values) are skipped, matching SQL's
    * count(DISTINCT) null semantics. */
  def kmvSketch(k: Int)(h: Column): Column = udaf(new KmvAgg(k)).apply(h)

  /** Merge two sketch columns relationally (the distributed-combine
    * law, exposed for cross-partition / cross-table unions): union,
    * distinct, keep the k smallest. Pure column functions, so the same
    * expression runs in any engine. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch column (referenced by NAME —
    * the integral `div` needs SQL-expression form; float division would
    * be inexact above 2^53): exact size while the sketch is not full,
    * else floor((k-1)·2^56 / h_(k)) in BIGINT. h_(k) is guarded by
    * greatest(·, 1): an all-zero md5 prefix (~2^-56 per group) would
    * otherwise NULL here but raise in DuckDB — a silent cross-engine
    * divergence; the oracle carries the identical guard. */
  def kmvEstimate(sketchCol: String, k: Int): Column = {
    val numerator = (k - 1).toLong * HashSpace
    when(size(col(sketchCol)) < k, size(col(sketchCol)).cast(LongType))
      .otherwise(expr(s"${numerator}L div greatest(element_at($sketchCol, $k), 1L)"))
  }

  /** The oracle-side estimate for a group whose distinct hashes carry
    * row_number `rn` (ascending) and distinct-count `nd`. */
  def kmvEstimateSql(k: Int): String = {
    val numerator = (k - 1).toLong * HashSpace
    s"""CASE WHEN max(nd) < $k THEN max(nd)
            ELSE $numerator // greatest(max(CASE WHEN rn = $k THEN h END), 1) END"""
  }

  /** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeable
    * form Agarwal et al. 2013, "Mergeable summaries"): at most k
    * (key, counter) pairs; any key with true frequency > N/(k+1) is
    * GUARANTEED present, and counters undercount by at most N/(k+1).
    * The summary is order-dependent (so never gate on it directly —
    * see [[heavyHitters]] for the deterministic two-pass form), but
    * the guarantee survives arbitrary partitioning and merging. */
  final class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], key: String): Map[String, Long] = {
      if (key == null) buf
      else if (buf.contains(key)) buf.updated(key, buf(key) + 1L)
      else if (buf.size < k) buf.updated(key, 1L)
      else { // decrement-all: drops at least one counter to zero
        buf.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (summed.size <= k) summed
      else { // subtract the (k+1)-th largest counter, keep positives
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Deterministic two-pass heavy hitters: keys with true frequency
    * STRICTLY above N/(k+1). Pass 1: the MG summary (bounded memory,
    * two-phase agg) — its candidate set is order-dependent but always
    * a SUPERSET of the true heavy keys. Pass 2: exact counts for the
    * ≤ k candidates via a broadcast semi-filter + combinable count,
    * thresholded as cnt·(k+1) > N in integers. The output set is
    * therefore exactly the true-heavy keys, independent of order —
    * which is what makes q_sp7 oracle-gateable at all. */
  def heavyHitters(rows: DataFrame, keyCol: String, k: Int): DataFrame = {
    // MgAgg is string-keyed: stringify the key up front so a
    // non-string key column costs one cast at the API boundary
    // instead of a runtime encoder error inside the aggregate
    val keyed = rows.select(col(keyCol).cast("string").as(keyCol))
    // pass 1 computes the MG summary AND the total row count together,
    // checkpointed (1 row) so the two consumers below don't re-run the
    // corpus aggregate — heavy hitters costs exactly two corpus scans
    val p1 = keyed.agg(udaf(new MgAgg(k)).apply(col(keyCol)).as("mg"),
      count(lit(1)).as("__n")).localCheckpoint()
    val cand = p1.select(explode(map_keys(col("mg"))).as(keyCol))
    keyed.join(broadcast(cand), Seq(keyCol))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
      .crossJoin(p1.select(col("__n")))
      .filter(col("n_exact") * (k + 1) > col("__n"))
      .select(col(keyCol), col("n_exact"))
  }

  /** Bloom filter over a key set (Bloom 1970) — the shuffle-volume
    * reducer: when the build side of a join is too big to broadcast
    * but its bit array (8 KB at m=2^16 as 32-bit words) is not, probe rows that fail the bloom
    * never enter the shuffle. md5-positioned, so build and probe are
    * engine-reproducible (gateable) and false negatives are
    * impossible by construction.
    *
    * Representation: m bits as m/64 (word_idx, bits) rows — built by
    * ONE map-side-combinable bit_or aggregate over the key scan, at
    * most m/64 rows whatever the build cardinality. */
  /** The `hashes` bit positions all come from ONE md5 digest, sliced
    * into 16-bit hex windows (position j = hex chars 4j+1..4j+4) — the
    * standard one-digest bloom family; md5 is the dominant per-row
    * cost, so 1 digest instead of `hashes` digests is a ~4× probe
    * speedup. Fixes mBits = 2^16 (a slice IS a bucket index). */
  val BloomBits = 65536

  private[operators] def bloomPos(key: Column, j: Int): Column =
    conv(substring(md5(concat(lit("bf:"), key)), 4 * j + 1, 4), 16, 10).cast(LongType)

  private[operators] def bloomPosSql(keyExpr: String, j: Int): String = {
    val digits = (0 until 4).map { i =>
      val weight = 1L << (4 * (3 - i))
      s"(strpos('0123456789abcdef', substring(md5('bf:' || $keyExpr), ${4 * j + i + 1}, 1)) - 1) * $weight"
    }
    s"(${digits.mkString(" + ")})"
  }

  def bloomBits(keys: DataFrame, keyCol: String, hashes: Int): DataFrame = {
    require(hashes >= 1 && hashes <= 8, "an md5 digest carries 8 16-bit slices")
    keys.select(explode(array((0 until hashes).map(j =>
        bloomPos(col(keyCol), j).as("p")): _*)).as("pos"))
      .groupBy(expr("pos div 32").as("word_idx")) // 32-bit words: shifts
      // stay ≤ 31, so no engine hits the signed-shift-overflow edge
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 32 as int)))").as("bits"))
  }

  /** Probe-side membership: each row tests its `hashes` bit positions
    * against the broadcast word table; keeps rows with ALL bits set
    * (supersets the true matches — zero false negatives). The join
    * fan-out is `hashes` broadcast lookups, all map-side. Bit tests
    * use &-masks over 32-bit words — sign-safe in any engine. */
  def bloomMightContain(probe: DataFrame, keyCol: String, bits: DataFrame,
      hashes: Int): DataFrame =
    bloomTest(probe, keyCol, bits, hashes)
      .filter(col("bloom_pass")).drop("bloom_pass")

  /** Non-filtering form: appends a `bloom_pass` boolean instead of
    * dropping rows — for single-pass funnels that count or route both
    * outcomes. Same broadcast-lookup plan. */
  def bloomTest(probe: DataFrame, keyCol: String, bits: DataFrame,
      hashes: Int): DataFrame = {
    val withPos = probe.withColumns(
      (0 until hashes).map(j => s"__p$j" -> bloomPos(col(keyCol), j)).toMap)
    (0 until hashes).foldLeft(withPos) { (df, j) =>
      df.join(broadcast(bits.select(
          col("word_idx").as(s"__w$j"), col("bits").as(s"__bits$j"))),
        expr(s"__p$j div 32") === col(s"__w$j"), "left")
    }.withColumn("bloom_pass", (0 until hashes).map { j =>
      expr(s"(coalesce(__bits$j, 0L) & shiftleft(1L, cast(__p$j % 32 as int))) != 0")
    }.reduce(_ && _))
      .drop((0 until hashes).flatMap(j => Seq(s"__p$j", s"__w$j", s"__bits$j")): _*)
  }

  /** Count-min cells for a key column: d rows × w additive buckets,
    * bucket_j(key) = md5_56("j:" || key) mod w. One bounded explode
    * (factor d) then a map-side-combinable count to d·w cells. */
  def cmsCells(keys: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    keys.select(explode(array((0 until d).map { j =>
        struct(lit(j).as("row_id"),
          (md5Long56(concat(lit(s"$j:"), col(keyCol))) % w).as("bucket"))
      }: _*)).as("c"))
      .groupBy(col("c.row_id").as("row_id"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for probe keys against the cells: join each
    * probe's d buckets to the (fixed-size, broadcast) cell table and
    * take the row minimum. */
  def cmsEstimate(probes: DataFrame, keyCol: String, cells: DataFrame,
      d: Int, w: Int): DataFrame = {
    val withBuckets = probes.select(col(keyCol) +: (0 until d).map { j =>
        (md5Long56(concat(lit(s"$j:"), col(keyCol))) % w).as(s"__b$j")
      }: _*)
    (0 until d).foldLeft(withBuckets) { (df, j) =>
      df.join(broadcast(cells.filter(col("row_id") === j)
          .select(col("bucket").as(s"__b$j"), col("cnt").as(s"__c$j"))),
        Seq(s"__b$j"), "left")
    }.select(col(keyCol),
      least((0 until d).map(j => coalesce(col(s"__c$j"), lit(0L))): _*).as("est"))
  }

  // ---------------- HyperLogLog registers (integer-exact) ----------------

  /** m = 2^6 register buckets; the 56-bit hash leaves a 50-bit
    * substream per bucket. */
  val HllBuckets = 64
  private val HllW = 50

  /** (bucket, rho) columns for a key expression: bucket = h mod m,
    * rho = leading-zero count of the 50-bit substream + 1, computed as
    * 51 − bitlength(h >> 6) via `length(bin(...))` — integer-exact in
    * both engines (Flajolet 2007's ρ with no float anywhere). */
  def hllBucketRho(keyExpr: Column): (Column, Column) = {
    val h = md5Long56(keyExpr)
    val w = shiftright(h, 6)
    (pmod(h, lit(HllBuckets.toLong)),
      when(w === 0L, lit((HllW + 1).toLong))
        .otherwise(lit((HllW + 1).toLong) - length(bin(w)).cast(LongType)))
  }

  /** HLL register table over `keyExpr`: (bucket, r) for EVERY bucket
    * 0..m−1 (empty = 0). This is the sketch STATE — what a 100 TB job
    * stores, merges across shards (per-bucket max — idempotent, so no
    * pre-distinct is needed) and gates on; the cardinality estimate
    * (α·m²·2^Rmax ⁄ Σ 2^(Rmax−r), whose harmonic sum is an exact
    * integer — see SketchesSpec) is downstream arithmetic over these
    * 64 rows. Plan: map-side (bucket, ρ) projection → two-phase max
    * agg → broadcast-spine left join for empty buckets. */
  def hllRegisters(df: DataFrame, keyExpr: Column): DataFrame = {
    val (bucket, rho) = hllBucketRho(keyExpr)
    val regs = df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    hllSpineJoin(df, regs)
  }

  /** Left-join partial registers onto the full 0..m−1 bucket spine. */
  def hllSpineJoin(df: DataFrame, regs: DataFrame): DataFrame =
    df.sparkSession.range(0, HllBuckets.toLong)
      .select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0L)).as("r"))

  /** DuckDB bucket/rho for a key SQL expression (h >> 6 keeps the
    * substream integer-exact — float division would round above
    * 2^53). */
  def hllBucketRhoSql(keySqlExpr: String): (String, String) = {
    val h = md5Long56Sql(keySqlExpr)
    (s"($h % $HllBuckets)",
      s"(CASE WHEN ($h >> 6) = 0 THEN ${HllW + 1} ELSE ${HllW + 1} - length(bin($h >> 6)) END)")
  }
}

/** Sketch gates. Naming: q_sp* (sketch processing). */
object SketchQueries extends QueryModule {
  import Sketches._

  private val K = 64
  private val userHashSql = md5Long56Sql("'u:' || CAST(user_id AS VARCHAR)")

  // shared by sp1 (direct) and sp3 (merge law): the semantic
  // definition ranks the full distinct hash set per group. Null
  // event_type is filtered SYMMETRICALLY on both engines: Spark's
  // groupBy would emit a null-keyed group but the oracle's equi-join
  // below never matches NULL — excluding it on both sides keeps the
  // gate honest if the events table ever carries null types.
  private val kmvOracle = s"""
      WITH et AS (SELECT DISTINCT event_type FROM events
                  WHERE event_type IS NOT NULL),
      h AS (
        SELECT DISTINCT event_type, $userHashSql AS h FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM h),
      e AS (
        SELECT event_type, ${kmvEstimateSql(K)} AS nd_est
        FROM r GROUP BY event_type)
      SELECT et.event_type, coalesce(e.nd_est, 0) AS nd_est
      FROM et LEFT JOIN e USING (event_type)
      ORDER BY et.event_type"""

  // KMV distinct-users-per-event-type: the sketch aggregation runs as
  // a two-phase ObjectHashAggregate (partial sketches combine
  // map-side); the oracle ranks the full distinct hash set — the
  // semantic definition, affordable at gate scale.
  private val sp1 = Q(
    "q_sp1_kmv_distinct",
    s"KMV (k=$K) distinct-count estimate of users per event type",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isNotNull)
      ev.select(col("event_type"),
          md5Long56(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .groupBy(col("event_type"))
        .agg(kmvSketch(K)(col("h")).as("__kmv_sk"))
        .select(col("event_type"), kmvEstimate("__kmv_sk", K).as("nd_est"))
        .orderBy(col("event_type"))
    },
    Some(kmvOracle))

  // KMV mergeability: sketch two disjoint halves independently, merge
  // with the relational combine, estimate from the merged sketch. By
  // the KMV merge law the result equals the whole-set sketch, so the
  // oracle is sp1's direct form over the union — the gate proves the
  // distributed-combine law holds cross-engine.
  private val sp3 = Q(
    "q_sp3_kmv_merge",
    s"KMV sketch merge law: estimate from merged half-sketches (k=$K)",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isNotNull)
        .select(col("event_type"), col("event_id"),
          md5Long56(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      def half(m: Int) = ev.filter(pmod(col("event_id"), lit(2)) === m)
        .groupBy(col("event_type")).agg(kmvSketch(K)(col("h")).as(s"sk$m"))
      half(0).join(half(1), Seq("event_type"), "full")
        .select(col("event_type"),
          kmvMerge(coalesce(col("sk0"), array().cast("array<long>")),
            coalesce(col("sk1"), lit(Array.empty[Long])), K).as("__kmv_sk"))
        .select(col("event_type"), kmvEstimate("__kmv_sk", K).as("nd_est"))
        .orderBy(col("event_type"))
    },
    Some(kmvOracle))

  // Sliding-window distinct via mergeable hourly sketches — the
  // streaming-analytics shape KMV exists for: sketch each hour once
  // (two-phase ObjectHashAggregate), then every trailing 6-hour window
  // is a MERGE of 6 bounded sketches, never a rescan of the raw
  // events. The range join is rewritten as an equi-aggregation: each
  // hourly sketch EXPLODES into the ≤6 target windows it contributes
  // to (bounded fan-out = winHours × K rows per hour), keyed shuffle
  // on the target hour. Ghost windows (target hours with no events of
  // their own) are excluded via the bounded hour set.
  private val sp9 = {
    val winHours = 6
    Q(
      "q_sp9_kmv_sliding",
      s"sliding $winHours-hour KMV (k=$K) distinct-user estimate per event hour",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(expr("unix_micros(ts) div 3600000000").as("hr"),
            md5Long56(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        val hourly = ev.groupBy(col("hr")).agg(kmvSketch(K)(col("h")).as("sk"))
        val hours = hourly.select(col("hr").as("tgt"))
        val contrib = hourly
          .select(col("sk"),
            explode(sequence(col("hr"), col("hr") + (winHours - 1))).as("tgt"))
          .join(broadcast(hours), Seq("tgt")) // drop ghost windows
          .select(col("tgt"), explode(col("sk")).as("h"))
        contrib.groupBy(col("tgt"))
          .agg(kmvSketch(K)(col("h")).as("__kmv_sk"))
          .select(col("tgt").as("hr"), kmvEstimate("__kmv_sk", K).as("nd_est"))
          .orderBy(col("hr"))
      },
      Some(s"""
        WITH eh AS (
          SELECT DISTINCT epoch_us(ts) // 3600000000 AS hr, $userHashSql AS h
          FROM events WHERE user_id IS NOT NULL),
        hs AS (
          SELECT hr, h FROM (
            SELECT hr, h, row_number() OVER (PARTITION BY hr ORDER BY h) AS rn
            FROM eh)
          WHERE rn <= $K),
        hours AS (SELECT DISTINCT hr FROM eh),
        c AS (
          SELECT t.hr AS tgt, s.h
          FROM hs s JOIN hours t ON t.hr BETWEEN s.hr AND s.hr + ${winHours - 1}),
        d AS (SELECT DISTINCT tgt, h FROM c),
        r AS (
          SELECT tgt, h,
                 row_number() OVER (PARTITION BY tgt ORDER BY h) AS rn,
                 count(*) OVER (PARTITION BY tgt) AS nd
          FROM d)
        SELECT tgt AS hr, ${kmvEstimateSql(K)} AS nd_est
        FROM r GROUP BY tgt ORDER BY hr"""))
  }

  private val D = 4
  private val W = 1024

  // Count-min word frequencies: cells built by one combinable count to
  // 4096 rows; probe words (a deterministic doc slice) estimated via
  // broadcast joins of the cells; exact counts computed only for the
  // probe slice (broadcast semi-filter first). est ≥ exact always.
  private val sp2 = Q(
    "q_sp2_cms_wordfreq",
    s"count-min sketch ($D×$W) word-frequency estimates vs exact, probe slice",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
      val cells = cmsCells(words, "word", D, W)
      val probes = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 0)
        .select(explode(tokens(col("text"))).as("word"))
        .distinct()
      val exact = words.join(broadcast(probes), Seq("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
      cmsEstimate(probes, "word", cells, D, W)
        .join(exact, Seq("word"))
        .select(col("word"), col("est"), col("n_exact"))
        .orderBy(col("word"))
    },
    Some {
      val bucketSql = (j: Int, word: String) =>
        s"${md5Long56Sql(s"'$j:' || " + word)} % $W"
      s"""
      WITH words AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents),
      cells AS (
        SELECT row_id, bucket, count(*) AS cnt FROM (
          ${(0 until D).map(j =>
            s"SELECT $j AS row_id, ${bucketSql(j, "word")} AS bucket FROM words")
            .mkString("\n          UNION ALL ")})
        GROUP BY row_id, bucket),
      probes AS (
        SELECT DISTINCT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents WHERE doc_id % 101 = 0),
      est AS (
        SELECT p.word, least(${(0 until D).map(j => s"coalesce(c$j.cnt, 0)").mkString(", ")}) AS est
        FROM probes p
        ${(0 until D).map(j =>
          s"LEFT JOIN cells c$j ON c$j.row_id = $j AND c$j.bucket = ${bucketSql(j, "p.word")}")
          .mkString("\n        ")}),
      exact AS (
        SELECT word, count(*) AS n_exact FROM words
        WHERE word IN (SELECT word FROM probes) GROUP BY word)
      SELECT e.word, e.est, x.n_exact
      FROM est e JOIN exact x ON x.word = e.word
      ORDER BY e.word"""
    })

  // Deterministic hash-sampled quantiles: the scale path for
  // percentiles when a full per-group sort is too expensive — rank
  // over a fixed md5-gated sample (the q_s1 sampling discipline, so
  // the "sample" is reproducible in any engine), percentile_disc
  // semantics via integer rank arithmetic (rn·d ≥ n·m ⇔ rank ≥
  // ceil(n·m/d)): no interpolation floats anywhere. At 100 TB the
  // rate drops so the per-group sample stays executor-sized; the
  // sampled rank window is the only non-map-side step.
  private val sp4 = Q(
    "q_sp4_sampled_quantiles",
    "hash-sampled p50/p90 of lineitem quantity per return flag (deterministic 10% sample)",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
      val th = Sampling.hexThreshold(0.1)
      val samp = li
        .filter(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 8) < lit(th))
        .select(col("l_returnflag"), floor(col("l_quantity")).cast(LongType).as("q"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("q"))
      val ranked = samp
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
      ranked.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n_sample"),
          min(when(col("rn") * 2 >= col("n"), col("q"))).as("p50_est"),
          min(when(col("rn") * 10 >= col("n") * 9, col("q"))).as("p90_est"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH samp AS (
        SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS q
        FROM lineitem
        WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 8)
              < '${Sampling.hexThreshold(0.1)}'),
      r AS (
        SELECT l_returnflag, q,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY q) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM samp)
      SELECT l_returnflag, max(n) AS n_sample,
             min(CASE WHEN rn * 2 >= n THEN q END) AS p50_est,
             min(CASE WHEN rn * 10 >= n * 9 THEN q END) AS p90_est
      FROM r GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // Single-pass table profiling: per column (rows, nulls, KMV distinct
  // estimate, min, max) — the data-profiling report a 100 TB ingest
  // runs first. ONE scan: every column's metrics aggregate in a single
  // map-side-combinable agg row (sketches included), then unpivot to
  // the per-column report. min/max stringify AFTER native-type
  // aggregation so ordering is numeric, formatting engine-identical.
  private val profCols = Seq("o_orderkey", "o_custkey", "o_orderstatus")

  private val sp5 = Q(
    "q_sp5_table_profile",
    s"single-pass profile of orders(${profCols.mkString(", ")}): rows/nulls/distinct-est/min/max",
    (s, d) => {
      val o = Tables.orders(s, d)
      val aggs = profCols.flatMap { c =>
        Seq(count(lit(1)).as(s"${c}__n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          kmvSketch(K)(md5Long56(concat(lit("p:"), col(c).cast("string")))).as(s"${c}__sk"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }
      // ONE corpus scan: the single agg row is checkpointed eagerly so
      // the per-column unpivot union below reads the 1-row result, not
      // the orders table three times (the ann11 pinned-plan pattern)
      val one = o.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      profCols.map { c =>
        one.select(lit(c).as("column_name"), col(s"${c}__n").as("n_rows"),
          col(s"${c}__nulls").as("n_null"),
          col(s"${c}__sk").as("__kmv_sk"),
          col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"))
          .select(col("column_name"), col("n_rows"), col("n_null"),
            kmvEstimate("__kmv_sk", K).as("nd_est"),
            col("min_value"), col("max_value"))
      }.reduce(_ union _).orderBy(col("column_name"))
    },
    Some {
      def one(c: String) = s"""
        SELECT '$c' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               coalesce((SELECT ${kmvEstimateSql(K)} FROM (
                  SELECT h, row_number() OVER (ORDER BY h) AS rn,
                         count(*) OVER () AS nd
                  FROM (SELECT DISTINCT ${md5Long56Sql(s"'p:' || CAST($c AS VARCHAR)")} AS h
                        FROM orders WHERE $c IS NOT NULL))), 0) AS nd_est,
               CAST(min($c) AS VARCHAR) AS min_value,
               CAST(max($c) AS VARCHAR) AS max_value
        FROM orders"""
      profCols.map(one).mkString("", "\n        UNION ALL", "\n        ORDER BY column_name")
    })

  // KMV set operations (the theta-sketch move, Dasgupta et al. 2016):
  // estimate the overlap of two key sets WITHOUT a join — sketch each
  // side independently (one scan each, never co-shuffled), then all
  // set arithmetic happens on two k-length arrays. At 100 TB this is
  // "how much does corpus A overlap corpus B" for the cost of two
  // scans and zero shuffle joins. Below theta (the merged sketch's
  // k-th minimum) both sketches are complete samples of the union, so
  // n_common/k estimates Jaccard and inter_est = n_common·union_est/k
  // — all BIGINT-exact, hence oracle-gated despite approximating.
  private val sp6 = Q(
    "q_sp6_kmv_overlap",
    s"KMV set-operation estimates: word-set overlap of even- vs odd-doc halves (k=$K)",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def side(m: Int) = docs.filter(pmod(col("doc_id"), lit(2)) === m)
        .select(explode(tokens(col("text"))).as("w"))
        .select(md5Long56(concat(lit("w:"), col("w"))).as("h"))
        .agg(kmvSketch(K)(col("h")).as(s"sk$m"))
      side(0).crossJoin(side(1))
        .withColumn("__kmv_sk", kmvMerge(col("sk0"), col("sk1"), K))
        .withColumn("__theta",
          when(size(col("__kmv_sk")) < K, lit(HashSpace))
            .otherwise(element_at(col("__kmv_sk"), K)))
        .withColumn("n_common",
          size(filter(array_intersect(col("sk0"), col("sk1")),
            x => x < col("__theta"))).cast(LongType))
        .withColumn("union_est", kmvEstimate("__kmv_sk", K))
        // sample points strictly below theta: k-1 when the sketch is
        // full (theta is the k-th element — not a sample, matching
        // kmvEstimate's (k-1)/h_k convention), the whole sketch when
        // not (theta = 2^56). Identical sets then give inter == union.
        .withColumn("__n_samp",
          greatest(size(filter(col("__kmv_sk"), x => x < col("__theta"))), lit(1))
            .cast(LongType))
        .select(col("n_common"), col("union_est"),
          expr(s"(n_common * union_est) div __n_samp").as("inter_est"))
    },
    Some {
      val wordHash = (side: String) =>
        s"""SELECT DISTINCT ${md5Long56Sql("'w:' || w")} AS h FROM (
              SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
              FROM documents WHERE doc_id % 2 = $side)"""
      s"""
      WITH ska AS (SELECT h FROM (${wordHash("0")}) ORDER BY h LIMIT $K),
      skb AS (SELECT h FROM (${wordHash("1")}) ORDER BY h LIMIT $K),
      merged AS (
        SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
        ORDER BY h LIMIT $K),
      m AS (SELECT count(*) AS n_m, max(h) AS h_k FROM merged),
      theta AS (
        SELECT CASE WHEN n_m < $K THEN $HashSpace ELSE h_k END AS t, n_m FROM m),
      c AS (
        SELECT count(*) AS n_common FROM ska
        WHERE h IN (SELECT h FROM skb) AND h < (SELECT t FROM theta)),
      u AS (
        SELECT CASE WHEN n_m < $K THEN n_m
                    ELSE ${(K - 1).toLong * HashSpace} // greatest(h_k, 1) END AS union_est
        FROM m)
      SELECT c.n_common, u.union_est,
             (c.n_common * u.union_est) //
               greatest((SELECT count(*) FROM merged WHERE h < (SELECT t FROM theta)), 1)
               AS inter_est
      FROM c CROSS JOIN u"""
    })

  // Two-pass heavy hitters: Misra-Gries candidates (bounded memory at
  // any scale, order-dependent) + exact verify of the ≤ k candidates
  // (broadcast semi-filter). The THRESHOLDED output is deterministic —
  // MG guarantees a superset, the exact pass cuts it to precisely the
  // keys with cnt·(k+1) > N — so the oracle is the plain HAVING query.
  private val MgK = 32

  private val sp7 = Q(
    "q_sp7_heavy_hitters",
    s"Misra-Gries two-pass heavy hitters: words with frequency > N/${MgK + 1}",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
      heavyHitters(words, "word", MgK).orderBy(col("word"))
    },
    Some(s"""
      WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents)
      SELECT word, count(*) AS n_exact
      FROM w GROUP BY word
      HAVING count(*) * ${MgK + 1} > (SELECT count(*) FROM w)
      ORDER BY word"""))

  // Bloom-filter semi-join pruning: the bit array of the urgent-order
  // keys (8 KB however many orders exist) broadcasts into the lineitem
  // scan; rows failing the bloom would never enter a subsequent
  // shuffle join. The gate reports probe/pass/true-match/false-
  // positive counts — false negatives are impossible, and the exact
  // fp count is md5-deterministic, so the whole funnel gates.
  private val BfHashes = 4

  private val sp8 = Q(
    "q_sp8_bloom_semi",
    s"bloom-filter semi-join pruning ($BloomBits bits, $BfHashes hashes): urgent orders vs lineitem",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").cast("string").as("k")).distinct()
      val bits = bloomBits(urgent, "k", BfHashes)
      val probe = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_orderkey").cast("string").as("k"))
      // ONE probe scan: bloom_pass and true-match flags ride the same
      // pass (urgent broadcasts for the truth flag), one conditional agg
      val flagged = bloomTest(probe, "k", bits, BfHashes)
        .join(broadcast(urgent.withColumn("__true", lit(1L))), Seq("k"), "left")
      flagged.agg(
          count(lit(1)).as("n_probe"),
          sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(coalesce(col("__true"), lit(0L))).as("n_match"))
        .select(col("n_probe"), col("n_pass"), col("n_match"),
          (col("n_pass") - col("n_match")).as("n_false_pos"))
    },
    Some {
      val posSql = (j: Int, key: String) => bloomPosSql(key, j)
      s"""
      WITH urgent AS (
        SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'),
      pos AS (
        ${(0 until BfHashes).map(j =>
          s"SELECT ${posSql(j, "k")} AS p FROM urgent").mkString("\n        UNION ALL ")}),
      bits AS (
        SELECT p // 32 AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
        FROM pos GROUP BY 1),
      probe AS (
        SELECT l_orderkey, CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
      tested AS (
        SELECT p.l_orderkey, p.k
        FROM probe p
        ${(0 until BfHashes).map(j =>
          s"LEFT JOIN bits b$j ON b$j.word_idx = (${posSql(j, "p.k")}) // 32").mkString("\n        ")}
        WHERE ${(0 until BfHashes).map(j =>
          s"(coalesce(b$j.bits, 0) & (CAST(1 AS BIGINT) << CAST((${posSql(j, "p.k")}) % 32 AS INT))) <> 0")
          .mkString("\n          AND ")})
      SELECT
        (SELECT count(*) FROM probe) AS n_probe,
        (SELECT count(*) FROM tested) AS n_pass,
        (SELECT count(*) FROM probe WHERE k IN (SELECT k FROM urgent)) AS n_match,
        (SELECT count(*) FROM tested) -
          (SELECT count(*) FROM probe WHERE k IN (SELECT k FROM urgent)) AS n_false_pos"""
    })

  // HLL register table over the part-key multiset. The registers ARE
  // the gate (integer-exact); the float estimate is downstream math
  // over 64 rows (SketchesSpec pins its accuracy).
  private val sp10 = {
    val (bSql, rSql) = hllBucketRhoSql("'p:' || CAST(l_partkey AS VARCHAR)")
    Q(
      "q_sp10_hll_registers",
      s"HyperLogLog register table (m=$HllBuckets) over lineitem part keys, integer-exact rho",
      (s, d) => hllRegisters(Tables.lineitem(s, d),
          concat(lit("p:"), col("l_partkey").cast("string")))
        .orderBy(col("bucket")),
      Some(s"""
        SELECT s.bucket, CAST(coalesce(max(x.rho), 0) AS BIGINT) AS r
        FROM (SELECT unnest(range(0, $HllBuckets)) AS bucket) s
        LEFT JOIN (SELECT $bSql AS bucket, $rSql AS rho FROM lineitem) x
          ON x.bucket = s.bucket
        GROUP BY s.bucket ORDER BY s.bucket"""))
  }

  // HLL shard-merge law, cross-engine: registers built independently
  // per shard (supplier mod 4 — how a 1000-executor job actually
  // sketches: one register set per partition, merged by per-bucket
  // max), then max-merged. Output must equal sp10's single-pass
  // registers; BOTH engines compute the two-level path, so the gate
  // proves the distributed combine associativity, not just equality.
  private val sp11 = {
    val (bSql, rSql) = hllBucketRhoSql("'p:' || CAST(l_partkey AS VARCHAR)")
    Q(
      "q_sp11_hll_merge",
      "HLL shard-merge: per-shard registers max-merged == single-pass registers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val (bucket, rho) = hllBucketRho(concat(lit("p:"), col("l_partkey").cast("string")))
        val shardRegs = li.select((col("l_suppkey") % 4).as("shard"),
            bucket.as("bucket"), rho.as("rho"))
          .groupBy(col("shard"), col("bucket")).agg(max(col("rho")).as("r"))
        val merged = shardRegs.groupBy(col("bucket")).agg(max(col("r")).as("r"))
        hllSpineJoin(li, merged).orderBy(col("bucket"))
      },
      Some(s"""
        WITH shard AS (
          SELECT l_suppkey % 4 AS shard, $bSql AS bucket, max($rSql) AS r
          FROM lineitem GROUP BY 1, 2),
        merged AS (SELECT bucket, max(r) AS r FROM shard GROUP BY bucket)
        SELECT s.bucket, CAST(coalesce(m.r, 0) AS BIGINT) AS r
        FROM (SELECT unnest(range(0, $HllBuckets)) AS bucket) s
        LEFT JOIN merged m ON m.bucket = s.bucket
        ORDER BY s.bucket"""))
  }

  // ---- mergeable quantile registers (sp12/sp13) ----
  //
  // The quantile analog of the sp10/sp11 register discipline. A
  // deterministic KLL-style compactor run to completion over a batch
  // collapses to STRIDED RANK SAMPLING: full-level odd-keep compaction
  // halves a sorted level and doubles its weight, so L halvings of a
  // shard's sorted run leave exactly the items at ranks 1, 1+2^L,
  // 1+2·2^L, … with weight 2^L — the sketch's batch normal form. Each
  // shard picks its own power-of-two stride s = min 2^L with
  // ⌈n/s⌉ ≤ K, so the register is ≤ K rows NO MATTER the shard size
  // (the bounded-model contract), and the INTEGER rank bound is exact:
  // for any value x, a shard's weighted register count over q ≤ x
  // lands in [true_count, true_count + s − 1] because rows with q ≤ x
  // occupy a rank prefix of the (q, unique-key) order. Merging shard
  // registers is plain union — each row carries its own weight — and
  // the merged estimate inherits the bound Σ(sᵢ − 1). At 100 TB:
  // shard = partition, the per-shard window never crosses executors,
  // the merged state is #shards · K rows, and stride adapts per shard
  // so skewed shards stay bounded.
  private val QregK = 64L
  private val QregShards = 8L

  /** Per-shard strided-rank quantile registers over floor(l_quantity):
    * (shard, rn, q, w) via the parameterized [[QuantileRegister]] core
    * (shared with q_sp15 and the streaming twin). The gate PINS its
    * shard key (`l_suppkey % 8`) for cross-engine determinism; the
    * production sharding is [[QuantileRegister.registersByPartition]]
    * — same core, shard = input partition. The unique 4-tuple key
    * breaks rank ties (the fz1 non-unique-key lesson). */
  private def quantileRegisters(li: DataFrame): DataFrame =
    QuantileRegister.registers(
      li.select((col("l_suppkey") % QregShards).as("shard"),
        floor(col("l_quantity")).cast(LongType).as("q"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
      valueCol = "q",
      tieCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      shardCols = Seq("shard"), k = QregK)

  private def quantileRegistersSql: String = s"""
    WITH qbase AS (
      SELECT l_suppkey % $QregShards AS shard, CAST(floor(l_quantity) AS BIGINT) AS q,
             l_orderkey, l_linenumber, l_partkey, l_suppkey
      FROM lineitem),
    qr AS (
      SELECT shard, q,
             CAST(row_number() OVER (PARTITION BY shard
               ORDER BY q, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n
      FROM qbase),
    qs AS (
      SELECT shard, q, rn,
             CASE WHEN (n + ${QregK - 1}) // $QregK <= 1 THEN 1
                  ELSE (CAST(1 AS BIGINT)
                        << CAST(length(bin((n + ${QregK - 1}) // $QregK - 1)) AS INT)) END AS w
      FROM qr),
    qreg AS (SELECT shard, rn, q, CAST(w AS BIGINT) AS w FROM qs WHERE (rn - 1) % w = 0)"""

  private val sp12 = Q(
    "q_sp12_quantile_registers",
    s"mergeable quantile registers: per-shard strided rank sample (K=$QregK), " +
      "the batch normal form of a deterministic KLL compactor",
    (s, d) => quantileRegisters(Tables.lineitem(s, d))
      .orderBy(col("shard"), col("rn")),
    Some(s"""$quantileRegistersSql
      SELECT shard, rn, q, w FROM qreg ORDER BY shard, rn"""))

  // Shard-merge law with the INTEGER rank bound gated cross-engine:
  // merged register rank estimates for a probe grid land in
  // [true_rank, true_rank + Σ(sᵢ−1)] — both engines compute estimate,
  // truth, bound, and the containment flag.
  private val sp13 = Q(
    "q_sp13_quantile_merge",
    "quantile shard-merge: union of per-shard registers estimates ranks within the exact integer bound",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val reg = quantileRegisters(li).localCheckpoint() // consumed 3× below; ≤ shards·K rows
      val bound = QuantileRegister.mergeBound(reg, Seq("shard"))
      val probes = s.range(1)
        .select(explode(sequence(lit(5L), lit(50L), lit(5L))).as("x"))
      val est = probes.join(reg, reg("q") <= probes("x"), "left")
        .groupBy(col("x")).agg(coalesce(sum(col("w")), lit(0L)).as("est_rank"))
      val hist = li.select(floor(col("l_quantity")).cast(LongType).as("q"))
        .groupBy(col("q")).agg(count(lit(1)).cast(LongType).as("c"))
      val tru = probes.join(hist, hist("q") <= probes("x"), "left")
        .groupBy(col("x")).agg(coalesce(sum(col("c")), lit(0L)).as("true_rank"))
      est.join(tru, Seq("x")).crossJoin(bound)
        .select(col("x"), col("est_rank"), col("true_rank"), col("bound"),
          (col("est_rank") >= col("true_rank") &&
            col("est_rank") <= col("true_rank") + col("bound")).cast("int").as("ok"))
        .orderBy(col("x"))
    },
    Some(s"""$quantileRegistersSql,
      strides AS (SELECT shard, max(w) AS st FROM qreg GROUP BY shard),
      bnd AS (SELECT CAST(sum(st - 1) AS BIGINT) AS bound FROM strides),
      probes AS (SELECT unnest(range(5, 55, 5)) AS x),
      est AS (SELECT p.x, CAST(coalesce(sum(g.w), 0) AS BIGINT) AS est_rank
              FROM probes p LEFT JOIN qreg g ON g.q <= p.x GROUP BY p.x),
      hist AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q, count(*) AS c
               FROM lineitem GROUP BY 1),
      tru AS (SELECT p.x, CAST(coalesce(sum(h.c), 0) AS BIGINT) AS true_rank
              FROM probes p LEFT JOIN hist h ON h.q <= p.x GROUP BY p.x)
      SELECT e.x, e.est_rank, t.true_rank, b.bound,
             CAST(e.est_rank >= t.true_rank AND e.est_rank <= t.true_rank + b.bound AS INT) AS ok
      FROM est e JOIN tru t ON t.x = e.x, bnd b ORDER BY e.x"""))

  // Quantile EXTRACTION from the merged registers — the user-facing
  // operator the register/merge gates exist for: percentile_disc-style
  // answers off the bounded sketch state instead of a corpus sort.
  // est(p) = the smallest register value whose running weighted count
  // reaches ceil(W·p/100) (integer comparison via cum·100 ≥ W·p). The
  // cumulative window runs over the REGISTER (≤ shards·K rows — a
  // bounded artifact, so the single-partition window is free), never
  // the corpus; by the sp13 bound the reported value's true rank is
  // within Σ(strideᵢ−1)+max(stride) of the target.
  private val sp14 = Q(
    "q_sp14_quantile_extract",
    "quantile extraction from merged registers: p25/p50/p75/p90 off the bounded sketch state",
    (s, d) => QuantileRegister.extract(
      quantileRegisters(Tables.lineitem(s, d)), "q", Seq("shard"),
      Seq(25L, 50L, 75L, 90L)),
    Some(s"""$quantileRegistersSql,
      cum AS (
        SELECT q, shard, rn, w,
               CAST(sum(w) OVER (ORDER BY q, shard, rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        FROM qreg),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM qreg),
      pcts AS (SELECT unnest([25, 50, 75, 90]) AS pct)
      SELECT p.pct, min(c.q) AS est_q
      FROM pcts p JOIN cum c ON c.cw * 100 >= (SELECT tw FROM tot) * p.pct
      GROUP BY p.pct ORDER BY p.pct"""))

  // Grouped form: quantile registers per KEY — percentiles per group
  // without a per-group sort of the corpus (sp4's sampled estimator
  // answers the same question approximately; this one carries the
  // sp12 exact integer rank bound PER GROUP). Register state is
  // bounded by #groups·shards·K rows; each group's stride adapts to
  // its own size, so skewed group sizes stay bounded. One window pass
  // over (grp, shard) builds the registers; extraction's cumulative
  // window runs per group over register rows only.
  private val sp15 = Q(
    "q_sp15_grouped_quantiles",
    "grouped quantile registers: per-returnflag p25/50/75/90 off bounded per-group state",
    (s, d) => {
      // the same parameterized core as sp12 — grouped via grpCols; the
      // gate pins its shard key (`% 4`), production shards by partition
      val reg = QuantileRegister.registers(
        Tables.lineitem(s, d).select(
          col("l_returnflag").as("grp"),
          (col("l_suppkey") % 4).as("shard"),
          floor(col("l_quantity")).cast(LongType).as("q"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        valueCol = "q",
        tieCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        shardCols = Seq("shard"), k = QregK, grpCols = Seq("grp"))
      QuantileRegister.extract(reg, "q", Seq("shard"),
        Seq(25L, 50L, 75L, 90L), grpCols = Seq("grp"))
    },
    Some(s"""
      WITH gbase AS (
        SELECT l_returnflag AS grp, l_suppkey % 4 AS shard,
               CAST(floor(l_quantity) AS BIGINT) AS q,
               l_orderkey, l_linenumber, l_partkey, l_suppkey
        FROM lineitem),
      gr AS (
        SELECT grp, shard, q,
               CAST(row_number() OVER (PARTITION BY grp, shard
                 ORDER BY q, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY grp, shard) AS BIGINT) AS n
        FROM gbase),
      gs AS (
        SELECT grp, shard, q, rn,
               CASE WHEN (n + ${QregK - 1}) // $QregK <= 1 THEN 1
                    ELSE (CAST(1 AS BIGINT)
                          << CAST(length(bin((n + ${QregK - 1}) // $QregK - 1)) AS INT)) END AS w
        FROM gr),
      greg AS (SELECT grp, shard, rn, q, CAST(w AS BIGINT) AS w FROM gs WHERE (rn - 1) % w = 0),
      gcum AS (
        SELECT grp, q, shard, rn, w,
               CAST(sum(w) OVER (PARTITION BY grp ORDER BY q, shard, rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tw
        FROM greg),
      gpcts AS (SELECT unnest([25, 50, 75, 90]) AS pct)
      SELECT c.grp, p.pct, min(c.q) AS est_q
      FROM gpcts p JOIN gcum c ON c.cw * 100 >= c.tw * p.pct
      GROUP BY c.grp, p.pct ORDER BY c.grp, p.pct"""))

  override val all: Seq[Q] = Seq(sp1, sp2, sp3, sp4, sp5, sp6, sp7, sp8, sp9,
    sp10, sp11, sp12, sp13, sp14, sp15)
}
