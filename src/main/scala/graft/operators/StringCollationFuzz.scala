package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import scala.util.Random

/** Differential fuzz over COLLATION-AWARE STRING FUNCTIONS — the
  * thirty-second population. Spark 4 routes string SEARCH through the
  * collation, not just comparison: `contains` / `startswith` /
  * `endswith` / `instr` / `locate` / `replace` / `split_part` /
  * `trim(chars FROM x)` / `LIKE` / `IN` / `array_contains` /
  * `array_position` all match case-insensitively under `UTF8_LCASE`
  * and via ICU StringSearch under `UNICODE_CI` (every one probed on
  * 4.1.2 — e.g. `instr(UNICODE_CI 'Customer#000 BUILDING',
  * 'building')` = 14, `replace(LCASE 'aAaA', 'aa', 'z')` = 'zz',
  * leftmost non-overlapping). fz28 covers the comparison surface
  * (GROUP/JOIN/DISTINCT/ORDER); this population covers the SEARCH
  * surface nothing else touches.
  *
  * Oracle (ICU-free, the fz28 discipline — the driver's DuckDB can't
  * LOAD icu): on ASCII, a case-insensitive match in `x` is an exact
  * match in `lower(x)` at the SAME position and length, so every
  * function compensates as itself over lowered operands:
  * `contains(lower(x), lower(pat))`, `strpos(lower(x), lower(pat))`
  * (= Spark's instr — positions align because ASCII case variants
  * are equal-length), `replace(lower(x), lower(pat), lower(rep))`
  * (same leftmost-non-overlapping occurrence set; rewriting exits
  * lower-normalize BOTH sides), `split_part(lower(x), lower(d), n)`,
  * `trim(lower(x), lower(chars))`, `list_contains/list_position`
  * over lowered elements. Probed divergence pinned by construction:
  * `LIKE` under UNICODE_CI is a DATATYPE_MISMATCH in Spark (only the
  * UTF8 collations support it) — LIKE arms generate UTF8_LCASE only.
  *
  * Case diversity is PLANTED two ways: the haystack is case-mangled
  * on a numeric residue (fz28's discipline), and the needle literals
  * flip case independently — a binary-match bug flips counts /
  * positions / rewrite outputs on every arm.
  *
  * Ids 24–29: REGEXP under collation — Spark compiles the pattern
  * case-insensitively under UTF8_LCASE (probed: `'apple' RLIKE 'APP'`
  * true, `regexp_count('aAbA', 'a')` = 3, `regexp_replace` rewrites
  * ALL ci occurrences), and REJECTS regexp on every other collation
  * family (UNICODE_CI and any RTRIM variant: DATATYPE_MISMATCH —
  * boundary pinned in the spec). Patterns generate all-lowercase, so
  * the lowered-operand oracle is literal: `regexp_matches(lower(v),
  * pat)` / `len(regexp_extract_all(...))` / `regexp_extract` /
  * `regexp_replace(..., 'g')` — DuckDB's replace is first-match-only
  * without the 'g' flag, Spark's is global. */
object StringCollationFuzz {

  val NQueries = 30
  val GateSeed = 20261701L

  private final case class STable(name: String, key: String, num: String,
      strs: Seq[String], needles: Seq[String], prefixes: Seq[String],
      suffixes: Seq[String])
  private def tables = Seq(
    STable("orders", "o_orderkey", "o_custkey",
      Seq("o_orderpriority", "o_orderpriority || '/' || o_orderstatus"),
      Seq("urgent", "HIGH", "eciF", "med", "LOW", "o"),
      Seq("1-u", "2-H", "5-l", "4-N"),
      Seq("ENT", "gh", "IED", "ow", "/o", "/F")),
    STable("customer", "c_custkey", "c_nationkey",
      Seq("c_mktsegment", "c_name"),
      Seq("build", "MACH", "ile", "Customer#", "USEH"),
      Seq("BU", "ma", "Fu", "Cust"),
      Seq("ING", "ery", "olD", "1", "5")))

  private def sparkView(t: String) = s"__fz32_$t"

  final case class SQuery(id: Int, sparkSql: String, duckSql: String,
      outCols: Seq[String])

  def queries(seed: Long = GateSeed, n: Int = NQueries): Seq[SQuery] =
    (0 until n).map(i => gen(i, new Random(seed * 911 + i)))

  /** Case-mangled haystack (the fz28 discipline). */
  private def mangled(t: STable, rnd: Random): String = {
    val s = t.strs(rnd.nextInt(t.strs.size))
    s"CASE WHEN ${t.num} % 3 = 0 THEN upper($s) " +
      s"WHEN ${t.num} % 3 = 1 THEN lower($s) ELSE $s END"
  }

  private def gen(id: Int, rnd: Random): SQuery = {
    if (id >= 24) return genRegexp(id, rnd)
    val t = tables(rnd.nextInt(tables.size))
    val k = s"CAST(${t.key} AS BIGINT)"
    val v = mangled(t, rnd)
    // LIKE exists only for UTF8 collations (probed: UNICODE_CI LIKE
    // is DATATYPE_MISMATCH) — arm 0 generates LIKE, so it stays on
    // UTF8_LCASE; the other arms alternate the ICU search path in
    val coll = if (id % 4 != 0 && rnd.nextBoolean()) "UNICODE_CI" else "UTF8_LCASE"
    def c(e: String) = s"CAST($e AS STRING COLLATE $coll)"
    (id % 4) match {
      case 0 =>
        // predicate arm: contains / startswith / endswith / LIKE as
        // WHERE filters — the match SET is the assertion
        val needle = t.needles(rnd.nextInt(t.needles.size))
        val prefix = t.prefixes(rnd.nextInt(t.prefixes.size))
        val suffix = t.suffixes(rnd.nextInt(t.suffixes.size))
        val (sparkPred, duckPred) = rnd.nextInt(4) match {
          case 0 => (s"contains(${c(v)}, ${c(s"'$needle'")})",
            s"contains(lower($v), lower('$needle'))")
          case 1 => (s"startswith(${c(v)}, ${c(s"'$prefix'")})",
            s"starts_with(lower($v), lower('$prefix'))")
          case 2 => (s"endswith(${c(v)}, ${c(s"'$suffix'")})",
            s"ends_with(lower($v), lower('$suffix'))")
          case _ => (s"${c(v)} LIKE ${c(s"'%$needle%'")}",
            s"lower($v) LIKE lower('%$needle%')")
        }
        val spark = s"SELECT CAST(count(*) AS BIGINT) AS a_0, " +
          s"CAST(coalesce(sum($k % 10007), 0) AS BIGINT) AS a_1 " +
          s"FROM ${sparkView(t.name)} WHERE $sparkPred"
        val duck = s"SELECT CAST(count(*) AS BIGINT) AS a_0, " +
          s"CAST(coalesce(sum($k % 10007), 0) AS BIGINT) AS a_1 " +
          s"FROM ${t.name} WHERE $duckPred"
        SQuery(id, spark, duck, Seq("a_0", "a_1"))
      case 1 =>
        // position arm: instr + boolean search exits per row (ASCII
        // case variants are equal-length, so ci positions equal
        // positions in the lowered twin)
        val needle = t.needles(rnd.nextInt(t.needles.size))
        val prefix = t.prefixes(rnd.nextInt(t.prefixes.size))
        val spark = s"SELECT $k AS key, " +
          s"CAST(instr(${c(v)}, ${c(s"'$needle'")}) AS BIGINT) AS a_0, " +
          s"CAST(CAST(startswith(${c(v)}, ${c(s"'$prefix'")}) AS INT) AS BIGINT) AS a_1, " +
          s"CAST(length(${c(v)}) AS BIGINT) AS a_2 " +
          s"FROM ${sparkView(t.name)}"
        val duck = s"SELECT $k AS key, " +
          s"CAST(strpos(lower($v), lower('$needle')) AS BIGINT) AS a_0, " +
          s"CAST(CAST(starts_with(lower($v), lower('$prefix')) AS INT) AS BIGINT) AS a_1, " +
          s"CAST(length($v) AS BIGINT) AS a_2 " +
          s"FROM ${t.name}"
        SQuery(id, spark, duck, Seq("key", "a_0", "a_1", "a_2"))
      case 2 =>
        // rewrite arm: replace + split_part, outputs lower-normalized
        // on BOTH sides (the replacement's case survives in Spark's
        // output; lowering both exits removes only that freedom while
        // keeping occurrence positions under test)
        val needle = t.needles(rnd.nextInt(t.needles.size))
        val delim = Seq("e", "N", "i", "R", "o")(rnd.nextInt(5))
        val part = 1 + rnd.nextInt(3)
        val spark = s"SELECT $k AS key, " +
          s"lower(replace(${c(v)}, ${c(s"'$needle'")}, 'Qz')) AS a_0, " +
          s"lower(split_part(${c(v)}, ${c(s"'$delim'")}, $part)) AS a_1 " +
          s"FROM ${sparkView(t.name)}"
        val duck = s"SELECT $k AS key, " +
          s"replace(lower($v), lower('$needle'), 'qz') AS a_0, " +
          s"split_part(lower($v), lower('$delim'), $part) AS a_1 " +
          s"FROM ${t.name}"
        SQuery(id, spark, duck, Seq("key", "a_0", "a_1"))
      case _ =>
        // trim/IN/array arm: collated trim-set, collated IN-list
        // filter, and array membership + position over a two-element
        // collated array
        val chars = Seq("oF", "Bg", "dE", "m1")(rnd.nextInt(4))
        val (l1, l2) =
          if (t.name == "orders") ("1-URGENT", "5-low") else ("BUILDING", "machinery")
        val needle = t.needles(rnd.nextInt(t.needles.size))
        val spark = s"SELECT $k AS key, " +
          s"lower(trim(${c(s"'$chars'")} FROM ${c(v)})) AS a_0, " +
          s"CAST(CAST(${c(v)} IN (${c(s"'$l1'")}, ${c(s"'$l2'")}) AS INT) AS BIGINT) AS a_1, " +
          s"CAST(CAST(array_contains(array(${c(v)}, ${c(s"'$needle'")}), ${c(s"'$l1'")}) AS INT) AS BIGINT) AS a_2, " +
          s"CAST(array_position(array(${c(s"'$needle'")}, ${c(v)}), ${c(v)}) AS BIGINT) AS a_3 " +
          s"FROM ${sparkView(t.name)}"
        val duck = s"SELECT $k AS key, " +
          s"trim(lower($v), lower('$chars')) AS a_0, " +
          s"CAST(CAST(lower($v) IN (lower('$l1'), lower('$l2')) AS INT) AS BIGINT) AS a_1, " +
          s"CAST(CAST(list_contains([lower($v), lower('$needle')], lower('$l1')) AS INT) AS BIGINT) AS a_2, " +
          s"CAST(list_position([lower('$needle'), lower($v)], lower($v)) AS BIGINT) AS a_3 " +
          s"FROM ${t.name}"
        SQuery(id, spark, duck, Seq("key", "a_0", "a_1", "a_2", "a_3"))
    }
  }

  /** The regexp quarter (ids 24–29): UTF8_LCASE only — the one
    * collation family whose regexp Spark accepts (see the scaladoc).
    * All-lowercase patterns make the lowered oracle literal. */
  private def genRegexp(id: Int, rnd: Random): SQuery = {
    val t = tables(rnd.nextInt(tables.size))
    val k = s"CAST(${t.key} AS BIGINT)"
    val v = mangled(t, rnd)
    def c(e: String) = s"CAST($e AS STRING COLLATE UTF8_LCASE)"
    val pats = Seq("urg", "ent$", "^[0-9]-", "[aeiou]+", "ing", "er",
      "cust[a-z]*", "[a-z]#?[0-9]*")
    val pat = pats(rnd.nextInt(pats.size))
    ((id - 24) % 3) match {
      case 0 =>
        // rlike predicate: the ci match SET is the assertion
        val spark = s"SELECT CAST(count(*) AS BIGINT) AS a_0, " +
          s"CAST(coalesce(sum($k % 10007), 0) AS BIGINT) AS a_1 " +
          s"FROM ${sparkView(t.name)} WHERE ${c(v)} RLIKE '$pat'"
        val duck = s"SELECT CAST(count(*) AS BIGINT) AS a_0, " +
          s"CAST(coalesce(sum($k % 10007), 0) AS BIGINT) AS a_1 " +
          s"FROM ${t.name} WHERE regexp_matches(lower($v), '$pat')"
        SQuery(id, spark, duck, Seq("a_0", "a_1"))
      case 1 =>
        // regexp_count + regexp_extract per row
        val spark = s"SELECT $k AS key, " +
          s"CAST(regexp_count(${c(v)}, '$pat') AS BIGINT) AS a_0, " +
          s"lower(regexp_extract(${c(v)}, '($pat)', 1)) AS a_1 " +
          s"FROM ${sparkView(t.name)}"
        val duck = s"SELECT $k AS key, " +
          s"CAST(len(regexp_extract_all(lower($v), '$pat')) AS BIGINT) AS a_0, " +
          s"regexp_extract(lower($v), '($pat)', 1) AS a_1 " +
          s"FROM ${t.name}"
        SQuery(id, spark, duck, Seq("key", "a_0", "a_1"))
      case _ =>
        // global ci regexp_replace, exits lower-normalized both sides
        val spark = s"SELECT $k AS key, " +
          s"lower(regexp_replace(${c(v)}, '$pat', 'Qz')) AS a_0 " +
          s"FROM ${sparkView(t.name)}"
        val duck = s"SELECT $k AS key, " +
          s"regexp_replace(lower($v), '$pat', 'qz', 'g') AS a_0 " +
          s"FROM ${t.name}"
        SQuery(id, spark, duck, Seq("key", "a_0"))
    }
  }

  // ---- fingerprint reduction (the RelFuzz discipline) ----

  def registerViews(spark: SparkSession, dir: String): Unit =
    for (t <- tables)
      spark.read.parquet(s"$dir/${t.name}.parquet")
        .createOrReplaceTempView(sparkView(t.name))

  def fingerprint(spark: SparkSession, q: SQuery): (Long, Long) = {
    import org.apache.spark.sql.types.StringType
    val canon = concat_ws("|", q.outCols.map(c =>
      coalesce(col(c).cast(StringType), lit(RelFuzz.NullSentinel))): _*)
    val r = spark.sql(q.sparkSql).select(canon.as("__c"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        coalesce(sum(Sketches.md5Long56(col("__c")) % RelFuzz.ModP), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  def fingerprintAll(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    import scala.collection.parallel.CollectionConverters._
    val pool = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(8))
    val par = queries().par
    par.tasksupport = pool
    val rows =
      try par.map { q =>
        val (n, h) = fingerprint(spark, q)
        (q.id.toLong, n, h)
      }.toList.sortBy(_._1)
      finally pool.environment.shutdown()
    import spark.implicits._
    rows.toDF("qid", "n_rows", "checksum")
  }

  def duckOracleSql: String = {
    val branches = queries().map { q =>
      val canon = "concat_ws('|', " + q.outCols.map(c =>
        s"coalesce(CAST($c AS VARCHAR), '${RelFuzz.NullSentinel}')").mkString(", ") + ")"
      s"""SELECT ${q.id} AS qid, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(${Sketches.md5Long56Sql("__c")} % ${RelFuzz.ModP}), 0) AS BIGINT) AS checksum
         |FROM (SELECT $canon AS __c FROM (${q.duckSql}) __q) __cq""".stripMargin
    }
    s"SELECT qid, n_rows, checksum FROM (\n${branches.mkString("\nUNION ALL\n")}\n) ORDER BY qid"
  }
}

/** q_fz32 — the collation-aware string-function differential gate. */
object StringCollationFuzzQueries extends QueryModule {
  private val fz32 = Q(
    "q_fz32_collated_strfuncs",
    s"collated string-function fuzz: ${StringCollationFuzz.NQueries} " +
      "seeded queries — contains/startswith/endswith/LIKE predicates, " +
      "instr positions, replace/split_part rewrites, trim-set/IN/array " +
      "membership, all matching through UTF8_LCASE or UNICODE_CI (ICU " +
      "StringSearch); oracle is each function over lower()ed operands " +
      "(probed position/occurrence-equivalent on ASCII), rewrite exits " +
      "lower-normalized both sides; LIKE stays UTF8_LCASE-only (probed " +
      "DATATYPE_MISMATCH under UNICODE_CI)",
    (s, d) => StringCollationFuzz.fingerprintAll(s, d),
    Some(StringCollationFuzz.duckOracleSql))

  override val all: Seq[Q] = Seq(fz32)
}
