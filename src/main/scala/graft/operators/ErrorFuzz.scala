package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.Random

/** Differential fuzz over ANSI ERROR SEMANTICS — the nineteenth
  * population, and the first whose queries are EXPECTED (half the
  * time) to error. This Spark build runs `spark.sql.ansi.enabled=true`
  * by default, so overflow / invalid-cast / array-index / division
  * errors are part of the engine's contract — yet every earlier
  * population is value-bounded by construction (fz9/fz13 exclude
  * overflow arms, fz11's sentinels sit below 2^53), which is exactly
  * the blind spot the round-11 judge's TailFrameRewrite finding lived
  * in: an optimizer rule turned a must-error query into a silent
  * answer and nothing caught it. This population gates
  * DOES-IT-ERROR, mechanically.
  *
  * **The oracle problem**: DuckDB cannot "agree to error" — probed:
  * it returns NULL for `x // 0`, `x % 0` and list[oob], and its
  * eager evaluation makes a CASE-guard useless against an erroring
  * subexpression. So each query is dual-rendered asymmetrically:
  *
  *  - the SPARK side runs the RAW query; the harness catches a
  *    whitelisted SparkThrowable condition (ARITHMETIC_OVERFLOW /
  *    CAST_INVALID_INPUT / CAST_OVERFLOW / DIVIDE_BY_ZERO /
  *    REMAINDER_BY_ZERO / INVALID_ARRAY_INDEX_IN_ELEMENT_AT /
  *    INVALID_INDEX_OF_ZERO — each probed in round 12) and reduces to
  *    `(qid, errored, n_rows, checksum)` with `(-1, -1)` sentinels
  *    when errored; any OTHER exception rethrows — a harness bug must
  *    fail the gate, not count as "errored";
  *  - the DUCKDB side computes the MUST-IT-ERROR predicate
  *    analytically (128-bit HUGEINT running sums for overflow, row
  *    counts for per-row error conditions) plus a GUARDED twin whose
  *    evaluation never errors (NULL-guarded casts, `//`'s native
  *    NULL-on-zero) for the non-error fingerprint.
  *
  * **Determinism of erroring-vs-not** (the property that makes an
  * error gate well-defined at all):
  *
  *  - whole-table sum-overflow arms use NON-NEGATIVE contributions
  *    only: partial sums are monotone under any accumulation order /
  *    partitioning, so "some partial overflows" ⟺ "the total is out
  *    of range" — order-independent, hence stable across Spark's
  *    nondeterministic partial-aggregation order;
  *  - window arms are deterministic because Spark accumulates frames
  *    in sort order: a running frame's partials are the partition
  *    prefix sums; a tail frame's partials are all interval sums
  *    starting at each frame head. Table arms keep contributions
  *    non-negative (any partial OOR ⟺ partition total OOR — also
  *    orientation-independent, so the gate is stable no matter what
  *    [[graft.plans.TailFrameRewrite]] does); the VALUES fixture arms
  *    carry MIXED signs and an exact oracle over the partial SET
  *    (prefix sums vs running extrema of earlier prefixes), which is
  *    precisely where a misfiring rewrite diverges: the id-cycled
  *    suppression fixture `[Long.MaxValue, 1, -1]` must error forward
  *    (MaxValue+1) but not backward — the round-11 judge's repro,
  *    now a GATE row;
  *  - cast / division / element_at errors are per-row conditions
  *    (exists a row that errors), independent of execution order; the
  *    probe confirmed WHERE-excluded rows never reach the cast.
  *
  * Edge arms are id-cycled, not RNG-rolled: family = id % 4
  * (agg-overflow / window / cast / div-mod-element), variant =
  * (id / 4) % 8 walking safe and must-error arms of each shape,
  * including element_at index 0 (a structural error) and the two
  * VALUES overflow fixtures. Ids 32–47 are the round-12 extension
  * block (same family dispatch, variant (id−32)/4): Long sums cast to
  * narrow DECIMALs (final-value overflow — order-independent), the
  * k-PRECEDING / k-FOLLOWING fixture twins of the suppression repro
  * plus the interval-not-prefix overflow fixture, ANSI date casts
  * (structural month validity, ISO-string canon per the raw-DATE
  * driver gotcha), and variable-index element_at. ~half the
  * population must error and ~half must answer (pinned in the
  * spec) — an all-error population would never test value agreement,
  * an all-answer one never error agreement. */
object ErrorFuzz {

  val NQueries = 48
  val GateSeed = 20260915L

  private val LongMax = "9223372036854775807"
  private val LongMin = "-9223372036854775808"
  /** Overflow multiplier: smallest table arm (customer sf0.001,
    * 150 rows, avg residue ≥ 10, 4 window partitions) still clears
    * Long.MaxValue ≥ 2×; per-row products stay ≤ 49 · 5e16 < 2^62. */
  private val KBig = "50000000000000000"

  /** Spark error conditions this population may legitimately raise
    * (each probed in round 12; the decimal pair is the
    * sub-conditioned NUMERIC_VALUE_OUT_OF_RANGE family a narrow
    * DECIMAL cast raises). */
  val ExpectedConditions: Set[String] = Set(
    "ARITHMETIC_OVERFLOW", "CAST_INVALID_INPUT", "CAST_OVERFLOW",
    "DIVIDE_BY_ZERO", "REMAINDER_BY_ZERO",
    "INVALID_ARRAY_INDEX_IN_ELEMENT_AT", "INVALID_INDEX_OF_ZERO",
    "NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION",
    "NUMERIC_VALUE_OUT_OF_RANGE.WITHOUT_SUGGESTION")

  /** Table metadata: `wide` spans ≫ 2^15 at every SF (for the
    * SMALLINT-overflow arm), `num`s are small non-negative residue
    * sources, `str` is dash-free (so constructed split lengths are
    * structural). */
  private final case class ETable(name: String, key: String,
      nums: Seq[String], wide: String, str: String, preds: Seq[String])
  private def tables = Seq(
    ETable("lineitem", "l_orderkey * 8 + l_linenumber",
      Seq("l_suppkey", "l_partkey", "l_orderkey"),
      "l_orderkey * 8 + l_linenumber", "l_returnflag",
      Seq("l_returnflag = 'R'", "l_linenumber % 2 = 0")),
    ETable("orders", "o_orderkey",
      Seq("o_custkey", "o_orderkey"), "o_orderkey * 37", "o_orderstatus",
      Seq("o_orderstatus = 'O'", "o_orderkey % 3 = 1")),
    ETable("customer", "c_custkey",
      Seq("c_nationkey", "c_custkey"), "c_custkey * 211", "c_mktsegment",
      Seq("c_mktsegment = 'BUILDING'", "c_custkey % 2 = 0")))

  /** Spark reads the gate tables under private view names so the gate
    * never races another module's views; the DuckDB oracle addresses
    * the driver-registered real names. */
  private def sparkView(t: String) = s"__fz19_$t"

  /** One generated query: raw Spark SQL (may error), the DuckDB
    * must-error predicate (never errors), the DuckDB guarded twin
    * (never errors; value-equal to Spark whenever Spark answers), and
    * the output columns both sides canonicalize over. */
  final case class EQuery(id: Int, sparkSql: String, duckErrPred: String,
      duckGuarded: String, outCols: Seq[String])

  def queries(seed: Long = GateSeed, n: Int = NQueries): Seq[EQuery] =
    (0 until n).map(i => gen(i, new Random(seed * 521 + i)))

  private def gen(id: Int, rnd: Random): EQuery = {
    val t = tables(rnd.nextInt(tables.size))
    if (id >= 32) {
      // round-12 extension block: ids 32–47, newVariant (id−32)/4
      val nv = (id - 32) / 4
      id % 4 match {
        case 0 => genDecimalCast(id, t, nv, rnd)
        case 1 => genExtFixture(id, nv)
        case 2 => genDateCast(id, t, nv, rnd)
        case _ => genVarIndex(id, t, nv, rnd)
      }
    } else {
      val v = (id / 4) % 8
      id % 4 match {
        case 0 => genAggOverflow(id, t, v, rnd)
        case 1 => genWindow(id, t, v, rnd)
        case 2 => genCast(id, t, v, rnd)
        case _ => genRowErrors(id, t, v, rnd)
      }
    }
  }

  // ---- family 0: whole-table sum overflow (non-negative terms) ----

  private def genAggOverflow(id: Int, t: ETable, v: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val ovf = v % 2 == 0
    // overflow arms run UNFILTERED so the total clears Long range at
    // every SF; safe arms may filter (both sides agree either way)
    val where =
      if (!ovf && rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}"
      else ""
    val k = if (ovf) KBig else (1 + rnd.nextInt(1000)).toString
    val term = s"($c % 50) * $k"
    val sparkSql = s"SELECT CAST(sum($term) AS BIGINT) AS a_0, " +
      s"CAST(count(*) AS BIGINT) AS a_1 FROM ${sparkView(t.name)}$where"
    val hsum = s"sum(CAST($c % 50 AS HUGEINT) * $k)"
    val duckErrPred = s"(SELECT CAST(CASE WHEN s > $LongMax OR s < $LongMin " +
      s"THEN 1 ELSE 0 END AS BIGINT) FROM (SELECT CAST(coalesce($hsum, 0) " +
      s"AS HUGEINT) AS s FROM ${t.name}$where) __s)"
    val duckGuarded = s"SELECT CAST(CASE WHEN __s.s > $LongMax OR __s.s < $LongMin " +
      s"THEN NULL ELSE __s.s END AS BIGINT) AS a_0, __s.c AS a_1 FROM " +
      s"(SELECT CAST($hsum AS HUGEINT) AS s, CAST(count(*) AS BIGINT) AS c " +
      s"FROM ${t.name}$where) __s"
    EQuery(id, sparkSql, duckErrPred, duckGuarded, Seq("a_0", "a_1"))
  }

  // ---- family 1: window sum overflow (running / tail / fixtures) ----

  /** Exact must-error predicate for a window whose partials are the
    * interval sums `{v_i + … + v_j : head(i) ≤ j}`: with prefix sums
    * S_j, a partial is S_j − S_{head−1}, so some partial is OOR ⟺
    * S_j minus the running min/max of earlier prefixes leaves Long
    * range. `tail = true` checks every interval start (tail frames
    * re-accumulate from each row); `tail = false` checks prefixes
    * only (running frames accumulate once from the partition head). */
  private def prefixErrPred(src: String, term: String, tail: Boolean): String = {
    // two window layers (DuckDB forbids nested window calls): inner
    // computes prefix sums S_j, outer the running extrema of EARLIER
    // prefixes. The interval-start prefix set includes the EMPTY
    // prefix S_0 = 0 (a frame headed at row 1), so the extrema clamp
    // at 0. Fixture-only (single partition, `k` order).
    val cond =
      if (tail)
        s"s - least(coalesce(mn, 0), 0) > $LongMax " +
          s"OR s - greatest(coalesce(mx, 0), 0) < $LongMin"
      else s"s > $LongMax OR s < $LongMin"
    s"(SELECT CAST(coalesce(max(CASE WHEN $cond THEN 1 ELSE 0 END), 0) AS BIGINT) " +
      s"FROM (SELECT s, " +
      s"CAST(min(s) OVER (ORDER BY k ASC " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS HUGEINT) AS mn, " +
      s"CAST(max(s) OVER (ORDER BY k ASC " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS HUGEINT) AS mx " +
      s"FROM (SELECT k, CAST(sum(CAST($term AS HUGEINT)) OVER (ORDER BY k ASC " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS s " +
      s"FROM $src) __p0) __p)"
  }

  private def genWindow(id: Int, t: ETable, v: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val g = t.nums(rnd.nextInt(t.nums.size))
    v match {
      case 4 =>
        // the round-11 suppression fixture, id-cycled into the GATE:
        // forward tail partials hit MaxValue+1 (must error); the
        // backward rewrite never would — a misfiring TailFrameRewrite
        // silently answers and diverges from the oracle here
        fixture(id, "(1, 9223372036854775807), (2, 1), (3, -1)", tail = true)
      case 5 =>
        // mixed-sign running fixture: prefixes 5e18, 1e19 (OOR), 4e18
        // — the TOTAL is in range, so only the exact prefix-set
        // oracle predicts this error
        fixture(id,
          "(1, 5000000000000000000), (2, 5000000000000000000), (3, -6000000000000000000)",
          tail = false)
      case 6 =>
        // mixed-sign answering fixture: every prefix in range
        fixture(id, "(1, 5000000000000000000), (2, -5000000000000000000), (3, 100)",
          tail = false)
      case 7 =>
        // mixed-sign answering TAIL fixture: every interval sum in
        // range; Long child ⇒ the rewrite must NOT fire (ANSI), and
        // both engines answer with equal values
        fixture(id, "(1, 5000000000000000000), (2, -5000000000000000000), (3, 100)",
          tail = true)
      case _ =>
        val ovf = v % 2 == 1
        val tail = v >= 2
        // tail-safe arms use an INT child so TailFrameRewrite fires
        // (O(n), ANSI-legal: Long buffer headroom) INSIDE the error
        // gate; overflow and running arms keep the Long child
        val term =
          if (ovf) s"($c % 50) * $KBig"
          else if (tail) s"CAST($c % 50 AS INT) * 1000"
          else s"($c % 50) * ${1 + rnd.nextInt(1000)}"
        val frame =
          if (tail) "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
          else "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        val part = s"$g % 4"
        val ord = s"${t.key} ASC, $c % 50 ASC"
        def sql(src: String) = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST(sum($term) OVER (PARTITION BY $part ORDER BY $ord $frame) " +
          s"AS BIGINT) AS a_0 FROM $src"
        // non-negative terms: any partial OOR ⟺ partition total OOR
        // (orientation-independent — stable under the rewrite)
        val hsum = s"sum(CAST($term AS HUGEINT))"
        val errPred = s"(SELECT CAST(coalesce(max(CASE WHEN s > $LongMax " +
          s"THEN 1 ELSE 0 END), 0) AS BIGINT) FROM " +
          s"(SELECT CAST($hsum AS HUGEINT) AS s FROM ${t.name} GROUP BY $part) __p)"
        val guarded = s"SELECT k, CAST(CASE WHEN s > $LongMax OR s < $LongMin " +
          s"THEN NULL ELSE s END AS BIGINT) AS a_0 FROM " +
          s"(SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST($hsum OVER (PARTITION BY $part ORDER BY $ord $frame) AS HUGEINT) AS s " +
          s"FROM ${t.name}) __w"
        EQuery(id, sql(sparkView(t.name)), errPred, guarded, Seq("k", "a_0"))
    }
  }

  /** A 3-row VALUES fixture arm (both engines parse the identical
    * VALUES list; Long literals stay BIGINT in each). `tail = true`
    * selects the CURRENT ROW .. UNBOUNDED FOLLOWING frame and the
    * full interval-set oracle; `tail = false` the running frame and
    * the prefix oracle. */
  private def fixture(id: Int, rows: String, tail: Boolean): EQuery =
    fixtureFrame(id, rows,
      if (tail) "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
      else "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      Some(tail))

  /** General fixture: `intervalPred` Some(true) = full interval-set
    * oracle (every frame head), Some(false) = prefix-set oracle (all
    * frames head at row 1 — also correct for `k PRECEDING` lowers
    * whose k covers the whole 3-row fixture), None = structurally
    * cannot error (Long-literal partials only; documented per call). */
  private def fixtureFrame(id: Int, rows: String, frame: String,
      intervalPred: Option[Boolean]): EQuery = {
    def src = s"(VALUES $rows) AS __t(k, v)"
    val sparkSql = s"SELECT k, CAST(sum(v) OVER (ORDER BY k ASC $frame) " +
      s"AS BIGINT) AS a_0 FROM $src"
    val errPred = intervalPred match {
      case Some(tail) => prefixErrPred(src, "v", tail)
      case None => "(SELECT CAST(0 AS BIGINT))"
    }
    val guarded = s"SELECT k, CAST(CASE WHEN s > $LongMax OR s < $LongMin " +
      s"THEN NULL ELSE s END AS BIGINT) AS a_0 FROM " +
      s"(SELECT k, CAST(sum(CAST(v AS HUGEINT)) OVER (ORDER BY k ASC $frame) " +
      s"AS HUGEINT) AS s FROM $src) __w"
    EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
  }

  // ---- round-12 extension arms (ids 32–47) ----

  /** Long sum cast to a narrow DECIMAL: overflow of the CAST is a
    * FINAL-value condition (non-negative terms, exact Long sum), so
    * erroring-vs-not is order-independent; the multiplier keeps the
    * Long sum itself far inside Long range at every SF while the
    * overflow arm clears 10^5 even on the smallest table. */
  private def genDecimalCast(id: Int, t: ETable, nv: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val ovf = nv % 2 == 0
    val k = 600
    val (target, thr) =
      if (ovf) ("DECIMAL(5,0)", "100000") else ("DECIMAL(18,0)", "1000000000000000000")
    val where =
      if (!ovf && rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}"
      else ""
    val sparkSql = s"SELECT CAST(CAST(sum(($c % 50) * $k) AS $target) AS STRING) " +
      s"AS a_0, CAST(count(*) AS BIGINT) AS a_1 FROM ${sparkView(t.name)}$where"
    val hsum = s"sum(CAST($c % 50 AS HUGEINT) * $k)"
    val duckErrPred = s"(SELECT CAST(CASE WHEN s >= $thr THEN 1 ELSE 0 END " +
      s"AS BIGINT) FROM (SELECT CAST(coalesce($hsum, 0) AS HUGEINT) AS s " +
      s"FROM ${t.name}$where) __s)"
    val duckGuarded = s"SELECT CAST(CAST(CASE WHEN __s.s >= $thr THEN NULL " +
      s"ELSE __s.s END AS $target) AS VARCHAR) AS a_0, __s.c AS a_1 FROM " +
      s"(SELECT CAST($hsum AS HUGEINT) AS s, CAST(count(*) AS BIGINT) AS c " +
      s"FROM ${t.name}$where) __s"
    EQuery(id, sparkSql, duckErrPred, duckGuarded, Seq("a_0", "a_1"))
  }

  /** Fixture arms for the k-PRECEDING / k-FOLLOWING rewrite
    * directions (the original fixtures covered CURRENT ROW and
    * running frames only). */
  private def genExtFixture(id: Int, nv: Int): EQuery = nv match {
    case 0 =>
      // 2-PRECEDING suppression twin of the judge fixture: every
      // 3-row frame heads at row 1, so the prefix oracle is exact;
      // forward partials hit MaxValue+1 (must error), the reversed
      // UNBOUNDED..2 FOLLOWING twin never would
      fixtureFrame(id, "(1, 9223372036854775807), (2, 1), (3, -1)",
        "ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING", Some(false))
    case 1 =>
      // k-FOLLOWING answering fixture: the only computed partial is
      // the single-row frame {100} (rows 2 and 3 have EMPTY frames →
      // NULL) — Long-literal partials cannot overflow, so the
      // predicate is structurally 0
      fixtureFrame(id, "(1, -5000000000000000000), (2, 5000000000000000000), (3, 100)",
        "ROWS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING", None)
    case 2 =>
      // 2-PRECEDING answering fixture: all partials in range; ON ≡
      // OFF values (6, 6, 6)
      fixtureFrame(id, "(1, 7), (2, 1), (3, -2)",
        "ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING", Some(false))
    case _ =>
      // interval-not-prefix overflow: prefixes (−3, Max−3, Max−1)
      // stay in range but the frame-2 partial Max+2 does not — the
      // arm that distinguishes the interval-set oracle from the
      // prefix one in the ERROR direction (fixture v5 does it in the
      // value direction)
      fixtureFrame(id, "(1, -3), (2, 9223372036854775807), (3, 2)",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", Some(true))
  }

  /** ANSI date-cast arms: month strings are structurally valid
    * ('01'–'09') or reach '13' on a data-dependent condition; both
    * engines render the DATE back as an ISO string for the canon. */
  private def genDateCast(id: Int, t: ETable, nv: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val c2 = t.nums(rnd.nextInt(t.nums.size))
    val invalid = nv % 2 == 0
    val where =
      if (rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}" else ""
    val badCond = if (invalid) s"$c % 4 = 3" else "1 = 0"
    def month(cast: String) =
      if (invalid) s"CAST(10 + $c % 4 AS $cast)" // '10'..'13'; 13 invalid
      else s"concat('0', CAST(1 + $c % 9 AS $cast))" // '01'..'09'
    def day(cast: String) = s"concat('0', CAST(1 + $c2 % 9 AS $cast))"
    val sSpark = s"concat('2024-', ${month("STRING")}, '-', ${day("STRING")})"
    val sDuck = s"concat('2024-', ${month("VARCHAR")}, '-', ${day("VARCHAR")})"
    val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
      s"CAST(CAST($sSpark AS DATE) AS STRING) AS a_0 FROM ${sparkView(t.name)}$where"
    val errPred = s"(SELECT CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END " +
      s"AS BIGINT) FROM ${t.name} WHERE ($badCond)" +
      (if (where.isEmpty) "" else s" AND (${where.stripPrefix(" WHERE ")})") + ")"
    val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
      s"CAST(CAST(CASE WHEN $badCond THEN NULL ELSE $sDuck END AS DATE) " +
      s"AS VARCHAR) AS a_0 FROM ${t.name}$where"
    EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
  }

  /** element_at with a VARIABLE index over a 2-token array: the OOB
    * condition is a per-row data condition instead of a literal
    * index (the original arms' shape). */
  private def genVarIndex(id: Int, t: ETable, nv: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val oob = nv % 2 == 0
    val m = if (oob) 3 else 2 // 1 + c % 3 reaches 3 (OOB); 1 + c % 2 stays valid
    val where =
      if (rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}" else ""
    val sparkArr = s"split(concat(${t.str}, '-', CAST($c % 10 AS STRING)), '-')"
    val duckArr = s"string_split(${t.str} || '-' || CAST($c % 10 AS VARCHAR), '-')"
    val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
      s"element_at($sparkArr, CAST(1 + $c % $m AS INT)) AS a_0 " +
      s"FROM ${sparkView(t.name)}$where"
    val errPred =
      if (!oob) "(SELECT CAST(0 AS BIGINT))"
      else s"(SELECT CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT) " +
        s"FROM ${t.name} WHERE $c % 3 = 2" +
        (if (where.isEmpty) "" else s" AND (${where.stripPrefix(" WHERE ")})") + ")"
    val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
      s"$duckArr[1 + $c % $m] AS a_0 FROM ${t.name}$where"
    EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
  }

  // ---- family 2: ANSI casts (invalid input / overflow) ----

  private def genCast(id: Int, t: ETable, v: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val where =
      if (rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}" else ""
    v % 4 match {
      case arm @ (0 | 1) =>
        // string → INT: the bad branch prepends a letter; arm 0's bad
        // condition is reachable (CAST_INVALID_INPUT expected wherever
        // a matching row survives the WHERE), arm 1's is structurally
        // impossible (x % 7 = 9) so the cast always succeeds
        val badCond = if (arm == 0) s"$c % 7 = 3" else s"$c % 7 = 9"
        val good = s"$c % 1000"
        val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST(CASE WHEN $badCond THEN concat('x', CAST($c AS STRING)) " +
          s"ELSE CAST($good AS STRING) END AS INT) AS a_0 " +
          s"FROM ${sparkView(t.name)}$where"
        val errPred = s"(SELECT CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END " +
          s"AS BIGINT) FROM ${t.name} WHERE ($badCond)" +
          (if (where.isEmpty) "" else s" AND (${where.stripPrefix(" WHERE ")})") + ")"
        val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST(CASE WHEN $badCond THEN NULL " +
          s"ELSE CAST($good AS VARCHAR) END AS INTEGER) AS a_0 FROM ${t.name}$where"
        EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
      case _ =>
        // BIGINT → SMALLINT: arm 2 spans 0..39999 (CAST_OVERFLOW
        // wherever a > 32767 row exists), arm 3 is bounded < 2^15
        val m = if (v % 4 == 2) 40000 else 30000
        val x = s"(${t.wide}) % $m"
        val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST($x AS SMALLINT) AS a_0 FROM ${sparkView(t.name)}$where"
        val errPred = s"(SELECT CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END " +
          s"AS BIGINT) FROM ${t.name} WHERE $x > 32767" +
          (if (where.isEmpty) "" else s" AND (${where.stripPrefix(" WHERE ")})") + ")"
        val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST(CASE WHEN $x > 32767 THEN NULL ELSE $x END AS SMALLINT) AS a_0 " +
          s"FROM ${t.name}$where"
        EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
    }
  }

  // ---- family 3: per-row errors (div / mod / element_at) ----

  private def genRowErrors(id: Int, t: ETable, v: Int, rnd: Random): EQuery = {
    val c = t.nums(rnd.nextInt(t.nums.size))
    val a = t.nums(rnd.nextInt(t.nums.size))
    val where =
      if (rnd.nextBoolean()) s" WHERE ${t.preds(rnd.nextInt(t.preds.size))}" else ""
    def wherePred(extra: String) = s"(SELECT CAST(CASE WHEN count(*) > 0 THEN 1 " +
      s"ELSE 0 END AS BIGINT) FROM ${t.name} WHERE $extra" +
      (if (where.isEmpty) "" else s" AND (${where.stripPrefix(" WHERE ")})") + ")"
    v % 4 match {
      case arm @ (0 | 1) =>
        // integer division / remainder; arm 0's divisor can hit zero
        // (DIVIDE_BY_ZERO / REMAINDER_BY_ZERO), arm 1's never does.
        // Operands are non-negative, where Spark's truncation and
        // DuckDB's flooring agree.
        // family-3 ids are ≡ 3 (mod 4) and this arm's are ≡ 3 (mod 16),
        // so the cycler must divide by 16 to actually alternate
        val useMod = (id / 16) % 2 == 0
        val d = if (arm == 0) s"$c % 9" else s"$c % 9 + 1"
        val num = s"($a % 97 + 1)"
        val (sop, dop) = if (useMod) ("%", "%") else ("div", "//")
        val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST($num $sop ($d) AS BIGINT) AS a_0 FROM ${sparkView(t.name)}$where"
        val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"CAST($num $dop ($d) AS BIGINT) AS a_0 FROM ${t.name}$where"
        EQuery(id, sparkSql, wherePred(s"($d) = 0"), guarded, Seq("k", "a_0"))
      case arm =>
        // element_at over a constructed 2-token array: index 1/2
        // answer, 3 is OOB (INVALID_ARRAY_INDEX_IN_ELEMENT_AT), 0 is
        // structurally invalid (INVALID_INDEX_OF_ZERO); DuckDB's
        // list[i] NULLs instead of erroring, so the guarded twin is
        // the raw index and the predicate is a row-count check
        val idx = arm match {
          case 2 => Seq(1, 2)(rnd.nextInt(2))
          // ids ≡ 15 (mod 16): /16 alternates OOB and zero-index
          case _ => if ((id / 16) % 2 == 0) 3 else 0
        }
        val sparkArr = s"split(concat(${t.str}, '-', CAST($c % 10 AS STRING)), '-')"
        val duckArr = s"string_split(${t.str} || '-' || CAST($c % 10 AS VARCHAR), '-')"
        val sparkSql = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          s"element_at($sparkArr, $idx) AS a_0 FROM ${sparkView(t.name)}$where"
        val guarded = s"SELECT CAST(${t.key} AS BIGINT) AS k, " +
          (if (idx == 0) "CAST(NULL AS VARCHAR) AS a_0"
           else s"$duckArr[$idx] AS a_0") +
          s" FROM ${t.name}$where"
        val errPred =
          if (idx <= 2 && idx >= 1) "(SELECT CAST(0 AS BIGINT))"
          else wherePred("1 = 1") // any surviving row errors (oob / zero index)
        EQuery(id, sparkSql, errPred, guarded, Seq("k", "a_0"))
    }
  }

  // ---- Spark-side outcomes (the gate's left half) ----

  /** Walks the cause chain for a SparkThrowable error condition. */
  private def condition(t: Throwable, depth: Int = 0): Option[String] = t match {
    case null => None
    case _ if depth > 12 => None
    case st: org.apache.spark.SparkThrowable if st.getCondition != null =>
      Some(st.getCondition)
    case other => condition(other.getCause, depth + 1)
  }

  /** Runs one raw query: Right((n_rows, checksum)) when it answers,
    * Left(condition) when it raises a whitelisted ANSI error; any
    * other failure propagates (harness bugs must not count as
    * "errored"). */
  def outcome(spark: SparkSession, q: EQuery): Either[String, (Long, Long)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType}
    try {
      val canon = concat_ws("|", q.outCols.map(c =>
        coalesce(col(c).cast(StringType), lit(RelFuzz.NullSentinel))): _*)
      val r = spark.sql(q.sparkSql).select(canon.as("__c"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          coalesce(sum(Sketches.md5Long56(col("__c")) % RelFuzz.ModP), lit(0L)).as("h"))
        .head()
      Right((r.getLong(0), r.getLong(1)))
    } catch {
      case e: Throwable =>
        condition(e).filter(ExpectedConditions.contains) match {
          case Some(cond) => Left(cond)
          case None => throw e
        }
    }
  }

  /** The gate frame: one row per query — (qid, errored, n_rows,
    * checksum), sentinels (-1, -1) when errored. Queries evaluate
    * against private temp views over the sf dir. */
  def outcomes(spark: SparkSession, dir: String): DataFrame = {
    for (t <- tables)
      FuzzExec.table(spark, dir, t.name)
        .createOrReplaceTempView(sparkView(t.name))
    import scala.collection.parallel.CollectionConverters._
    val pool = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(FuzzExec.poolSize(spark)))
    val par = queries().par
    par.tasksupport = pool
    val rows =
      try par.map { q =>
        outcome(spark, q) match {
          case Left(_) => (q.id.toLong, 1L, -1L, -1L)
          case Right((n, h)) => (q.id.toLong, 0L, n, h)
        }
      }.toList.sortBy(_._1)
      finally pool.environment.shutdown()
    import spark.implicits._
    rows.toDF("qid", "errored", "n_rows", "checksum")
  }

  // ---- DuckDB oracle (the gate's right half) ----

  def duckOracleSql: String = {
    val branches = queries().map { q =>
      val canon = "concat_ws('|', " + q.outCols.map(c =>
        s"coalesce(CAST($c AS VARCHAR), '${RelFuzz.NullSentinel}')").mkString(", ") + ")"
      s"""SELECT ${q.id} AS qid, __e.err AS errored,
         |  CASE WHEN __e.err = 1 THEN -1 ELSE __f.n_rows END AS n_rows,
         |  CASE WHEN __e.err = 1 THEN -1 ELSE __f.checksum END AS checksum
         |FROM (SELECT ${q.duckErrPred} AS err) __e CROSS JOIN
         |  (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(${Sketches.md5Long56Sql("__c")} % ${RelFuzz.ModP}), 0) AS BIGINT) AS checksum
         |  FROM (SELECT $canon AS __c FROM (${q.duckGuarded}) __q) __cq) __f""".stripMargin
    }
    s"SELECT qid, errored, n_rows, checksum FROM (\n${branches.mkString("\nUNION ALL\n")}\n) ORDER BY qid"
  }
}

/** q_fz19 — the ANSI error-agreement differential gate. */
object ErrorFuzzQueries extends QueryModule {
  private val fz19 = Q(
    "q_fz19_error_fuzz",
    s"ANSI error-agreement fuzz: ${ErrorFuzz.NQueries} seeded queries " +
      "(sum-overflow agg/window/tail incl. the round-11 suppression fixture " +
      "and its k-PRECEDING/k-FOLLOWING twins, invalid/overflowing casts incl. " +
      "dates and narrow decimals, div-mod-by-zero, element_at OOB/zero/" +
      "variable-index) gated on DOES-IT-ERROR vs an analytic DuckDB oracle " +
      "(HUGEINT partial-sum checks, guarded twins for the non-error " +
      "fingerprints)",
    (s, d) => ErrorFuzz.outcomes(s, d),
    Some(ErrorFuzz.duckOracleSql))

  override val all: Seq[Q] = Seq(fz19)
}
