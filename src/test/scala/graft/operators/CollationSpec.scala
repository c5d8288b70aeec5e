package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collation rule-safety sweep (round-12 "what's missing #1"): every
  * library operator that assumes equality ⇒ interchangeability,
  * audited against collated string columns. The cross-engine surface
  * lives in q_fz28 (CollationFuzz); this spec pins the Spark-side
  * semantics of the operators a differential oracle can't reach —
  * key-joined merges, window best-per-group, and the dedup family's
  * DELIBERATE binary-equality scope.
  *
  * Scope decision, documented once: operators that equate rows via a
  * HASH of the string (md5/xxhash fingerprints — exact dedup, LSH,
  * SimHash) operate on the string's BYTES and ignore any collation on
  * the column. That is by design: their case-insensitivity comes from
  * their own canonicalization (lower + punctuation strip) applied
  * BEFORE hashing, which is both collation-independent and stronger
  * (it also folds whitespace/punct). A collated input column neither
  * changes nor breaks them — pinned below. Operators that equate rows
  * via Spark COMPARISONS (joins, groupBy, window partitions, distinct)
  * follow the column's collation automatically, because the engine's
  * equality is collation-aware end to end — also pinned below. */
class CollationSpec extends SparkSpec {

  import spark.implicits._

  private def lcase(c: String) = s"CAST($c AS STRING COLLATE UTF8_LCASE)"

  /** A small keyed frame whose key column carries UTF8_LCASE. */
  private def collatedExisting: DataFrame =
    Seq(("Alpha", 1L, "old-a"), ("BETA", 2L, "old-b"), ("gamma", 3L, "old-g"))
      .toDF("k", "n", "v")
      .selectExpr(s"${lcase("k")} AS k", "n", "v")

  test("upsert joins follow the key collation: case-variant keys MATCH") {
    // 'ALPHA' must update the 'Alpha' row, not insert a second one —
    // the join condition compares collated-ly because the column does
    val updates = Seq(("ALPHA", 10L, "new-a"), ("delta", 4L, "new-d"))
      .toDF("k", "n", "v")
      .selectExpr(s"${lcase("k")} AS k", "n", "v")
    val out = Upsert.upsert(collatedExisting, updates, Seq("k"))
    assert(out.count() == 4, "case-variant key must merge, not duplicate")
    val byK = out.collect().map(r => (r.getString(0).toLowerCase, r.getString(2))).toMap
    assert(byK("alpha") == "new-a", "update wins on the case-matched key")
    assert(byK("beta") == "old-b")
    assert(byK("delta") == "new-d")
  }

  test("upsertKeepExisting fills holes across case-variant keys") {
    val existing = Seq(("Alpha", 1L, null: String), ("BETA", 2L, "keep"))
      .toDF("k", "n", "v").selectExpr(s"${lcase("k")} AS k", "n", "v")
    val updates = Seq(("ALPHA", 9L, "fill"), ("beta", 9L, "lose"))
      .toDF("k", "n", "v").selectExpr(s"${lcase("k")} AS k", "n", "v")
    val out = Upsert.upsertKeepExisting(existing, updates, Seq("k"))
    val byK = out.collect().map(r => (r.getString(0).toLowerCase, r.getString(2))).toMap
    assert(out.count() == 2)
    assert(byK("alpha") == "fill", "null hole fills through the case-variant key")
    assert(byK("beta") == "keep", "existing non-null value wins")
  }

  test("groupBy / dropDuplicates / window partitions merge case-variants on collated columns") {
    val df = Seq("Apple", "APPLE", "apple", "Pear", "PEAR", "plum")
      .toDF("s").selectExpr(s"${lcase("s")} AS s")
    assert(df.groupBy("s").count().count() == 3,
      "collated groupBy must merge case-variants")
    assert(df.dropDuplicates("s").count() == 3,
      "collated dropDuplicates must merge case-variants")
    // best-per-group over a collated partition key: one winner per
    // case-insensitive group (the q_j6b shape on a collated key)
    val keyed = Seq(("Apple", 5L), ("APPLE", 9L), ("Pear", 3L), ("PEAR", 1L))
      .toDF("s", "score").selectExpr(s"${lcase("s")} AS s", "score")
    val best = keyed.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("s")).orderBy(col("score").desc)))
      .filter(col("rn") === 1)
    val winners = best.collect().map(r => (r.getString(0).toLowerCase, r.getLong(1))).toMap
    assert(winners == Map("apple" -> 9L, "pear" -> 3L),
      "window partition must be collation-aware; best row per logical group")
  }

  test("collated ORDER places case-variants as peers (rank ties)") {
    val df = Seq(("a", "zebra"), ("b", "ZEBRA"), ("c", "apple"))
      .toDF("id", "s").selectExpr("id", s"${lcase("s")} AS s")
    val ranked = df.select(col("id"),
        rank().over(org.apache.spark.sql.expressions.Window.orderBy(col("s")))
          .as("r"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(ranked("a") == ranked("b"), "case-variants must tie under collated rank")
    assert(ranked("c") == 1)
  }

  test("hash-fingerprint dedup is binary-scoped BY DESIGN: collation on the column changes nothing") {
    // the exact-dedup canonicalization (lower + strip) already folds
    // case before md5 — so a collated input column must neither change
    // the result nor error; and a RAW md5 over the column ignores the
    // collation entirely (bytes in, bytes out)
    val docs = Seq(("d1", "The Quick Fox"), ("d2", "the quick fox"), ("d3", "other text"))
      .toDF("doc_id", "text")
    val collated = docs.selectExpr("doc_id", s"${lcase("text")} AS text")
    def canonGroups(df: DataFrame): Long = df.selectExpr(
        "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))) AS fp")
      .groupBy("fp").count().count()
    assert(canonGroups(docs) == 2, "canonicalization folds case pre-hash")
    assert(canonGroups(collated) == 2, "collated input: same result, no error")
    // raw md5 is byte-equality regardless of collation — the scope
    // boundary, stated and pinned rather than silently assumed
    val rawGroups = collated.selectExpr("md5(text) AS fp").groupBy("fp").count().count()
    assert(rawGroups == 3,
      "raw hashes see bytes, not collations — 'The Quick Fox' != 'the quick fox'")
  }

  test("TopKProjectInline preserves collated ordering through the CSE-split collapse") {
    // the other injected rule touched by collations: it collapses
    // stacked Projects above a global Sort to restore the bounded-heap
    // top-k plan, and must carry the SortOrder — collation included —
    // verbatim. Drive the CSE-split shape (a shared subexpression in
    // both the sort key and the projection) over a collated key and
    // pin plan + values against rule-OFF.
    val df = Seq(("x", "zebra"), ("y", "APPLE"), ("z", "apple"), ("w", "Mango"))
      .toDF("id", "s")
      .selectExpr("id", s"${lcase("s")} AS s")
    df.createOrReplaceTempView("__coll_topk")
    // sharp edge, pinned by construction: even a LITERAL beside a
    // collated column inside nullif is INDETERMINATE_COLLATION in
    // Spark 4 — the literal must be collated explicitly
    val none = lcase("'none'")
    val q = s"""SELECT id, nullif(s, $none) AS k FROM __coll_topk
      ORDER BY nullif(s, $none), id LIMIT 2"""
    val fast = spark.sql(q)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"the collated CSE-split top-k must recover the bounded heap:\n$plan")
    val a = fast.collect().map(r => (r.getString(0), r.getString(1).toLowerCase))
    val off = {
      spark.conf.set(graft.plans.TopKProjectInline.ConfKey, "false")
      try spark.sql(q).collect().map(r => (r.getString(0), r.getString(1).toLowerCase))
      finally spark.conf.set(graft.plans.TopKProjectInline.ConfKey, "true")
    }
    assert(a.sameElements(off), "rule ON must equal rule OFF under collated order")
    // the collation actually decided the order: case-insensitively
    // 'APPLE'/'apple' sort before 'Mango' before 'zebra' (binary
    // order would put 'APPLE' and 'Mango' before 'apple')
    assert(a.map(_._2).forall(_ == "apple"),
      s"top-2 under UTF8_LCASE must be the two apples, got ${a.toSeq}")
  }

  // ---- §UNICODE: the ICU root collations (round-14) -------------------
  //
  // The cross-engine-gateable slice of UNICODE/UNICODE_CI (equality
  // shapes + ASCII ordering) lives in q_fz28 ids 30–41 with a probed
  // ICU-free oracle; what CANNOT be gated against the ASCII testdata —
  // accent behavior, canonical equivalence, the ICU-vs-bytes ordering
  // divergences — is pinned here ONE-ENGINE (probed on 4.1.2,
  // 2026-08-16, cross-checked against DuckDB icu 'en' in a session
  // that can LOAD icu), so a Spark/ICU upgrade can't silently shift
  // the semantics the library sweep relies on.

  private def uniCi(c: String) = s"CAST($c AS STRING COLLATE UNICODE_CI)"

  test("§UNICODE library sweep: upsert / groupBy / dedup / best-per-group follow UNICODE_CI") {
    val existing = Seq(("Alpha", 1L, "old-a"), ("BETA", 2L, "old-b"))
      .toDF("k", "n", "v").selectExpr(s"${uniCi("k")} AS k", "n", "v")
    val updates = Seq(("ALPHA", 10L, "new-a"), ("delta", 4L, "new-d"))
      .toDF("k", "n", "v").selectExpr(s"${uniCi("k")} AS k", "n", "v")
    val out = Upsert.upsert(existing, updates, Seq("k"))
    assert(out.count() == 3, "ICU case-variant key must merge, not duplicate")
    val byK = out.collect().map(r => (r.getString(0).toLowerCase, r.getString(2))).toMap
    assert(byK("alpha") == "new-a" && byK("beta") == "old-b" && byK("delta") == "new-d")

    val df = Seq("Apple", "APPLE", "apple", "Pear", "PEAR", "plum")
      .toDF("s").selectExpr(s"${uniCi("s")} AS s")
    assert(df.groupBy("s").count().count() == 3)
    assert(df.dropDuplicates("s").count() == 3)
    val keyed = Seq(("Apple", 5L), ("APPLE", 9L), ("Pear", 3L))
      .toDF("s", "score").selectExpr(s"${uniCi("s")} AS s", "score")
    val best = keyed.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("s")).orderBy(col("score").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getString(0).toLowerCase, r.getLong(1))).toMap
    assert(best == Map("apple" -> 9L, "pear" -> 3L))
  }

  test("§UNICODE_CI is case-insensitive but ACCENT-SENSITIVE: café = CAFÉ ≠ cafe") {
    // ICU secondary strength folds case, keeps accents — the boundary
    // that separates UNICODE_CI from a lower()-and-strip normalizer
    def eq(a: String, b: String): Boolean =
      spark.sql(s"SELECT ${uniCi(s"'$a'")} = ${uniCi(s"'$b'")}").head().getBoolean(0)
    assert(eq("café", "CAFÉ"), "case folds under CI")
    assert(!eq("café", "cafe"), "accents do NOT fold under CI")
    assert(!eq("résumé", "resume"))
  }

  test("§UNICODE equality is canonical equivalence: composed é = decomposed e+´") {
    // even the case-SENSITIVE ICU collation equates canonically
    // equivalent sequences — precisely why TailFrameRewrite's guard
    // refuses it (FramesSpec pins the plan): equal strings with
    // different bytes make min/max representatives engine-internal
    val composed = "café"
    val decomposed = "café"
    val r = spark.sql(
      s"""SELECT CAST('$composed' AS STRING COLLATE UNICODE) =
         |       CAST('$decomposed' AS STRING COLLATE UNICODE),
         |       '$composed' = '$decomposed'""".stripMargin).head()
    assert(r.getBoolean(0), "UNICODE: NFC ≡ NFD")
    assert(!r.getBoolean(1), "binary: different bytes stay different")
    // and grouping merges them — 2 logical values from 3 byte-strings
    val g = Seq(composed, decomposed, "other").toDF("s")
      .selectExpr("CAST(s AS STRING COLLATE UNICODE) AS s")
      .groupBy("s").count().count()
    assert(g == 2, "UNICODE groupBy must merge canonical equivalents")
  }

  test("§UNICODE root ordering diverges from bytes: lowercase-first, punctuation reordered") {
    // the facts the fz28 UNICODE rank-arm oracle is built on, pinned
    // one-engine: ICU root sorts 'a' BEFORE 'A' (bytes: after) and
    // '-' BEFORE '#' (bytes: after); letters/digits keep byte order
    def lt(a: String, b: String): Boolean =
      spark.sql(s"SELECT CAST('$a' AS STRING COLLATE UNICODE) < " +
        s"CAST('$b' AS STRING COLLATE UNICODE)").head().getBoolean(0)
    assert(lt("a", "A") && !lt("A", "a"), "ICU tertiary: lowercase first")
    assert(lt("-", "#"), "ICU root: hyphen before hash (bytes say the opposite)")
    assert(lt("_", "a") && !lt("Z", "_"),
      "ICU root: punctuation before letters on BOTH cases (bytes split them)")
    assert(lt("9", "A") && lt("m", "z"), "digits before letters; letters in order")
  }

  test("collation PROPAGATES through string functions: derived columns stay collated") {
    // substring/concat/upper/rtrim of a collated column return the
    // SAME collation (typeof pinned), so grouping by a derived key is
    // still case-insensitive — the q_fz32 search gate and every
    // library operator over derived string keys rely on this
    val ty = spark.sql(
      s"SELECT typeof(substring(${lcase("'Apple'")}, 1, 3))").head().getString(0)
    assert(ty == "string collate UTF8_LCASE", s"propagation lost: $ty")
    for (expr <- Seq(
        s"substring(${lcase("'Apple'")}, 1, 3) = substring(${lcase("'APPLE'")}, 1, 3)",
        s"concat(${lcase("'Ap'")}, 'X') = concat(${lcase("'aP'")}, 'x')",
        s"upper(${lcase("'apple'")}) = upper(${lcase("'APPLE'")})",
        s"rtrim(${lcase("'Apple  '")}) = rtrim(${lcase("'APPLE'")})"))
      assert(spark.sql(s"SELECT $expr").head().getBoolean(0), expr)
    import spark.implicits._
    val g = Seq("Apple", "APPLE", "apricot").toDF("s")
      .selectExpr(s"${lcase("s")} AS s")
      .selectExpr("substring(s, 1, 3) AS p").groupBy("p").count().count()
    assert(g == 2, "grouping by a DERIVED collated key must stay case-insensitive")
  }

  test("representative-class aggregates over collated ties: membership invariant, not identity") {
    // mode/min_by/max_by over collation-equal ties surface SOME member
    // of the tied class — which one is engine-internal (the fz27/fz28
    // representative discipline), so the pin is the INVARIANT every
    // consumer may rely on: (a) ties are recognized (the collation
    // decided the grouping/ordering), (b) the surfaced value is a
    // MEMBER of the tied class. An upgrade may legally change the
    // member; it may not leave the class.
    val df = Seq(("Apple", 1L), ("APPLE", 2L), ("apple", 3L), ("pear", 9L))
      .toDF("s", "n").selectExpr(s"${lcase("s")} AS s", "n")
    df.createOrReplaceTempView("__coll_repr")
    // mode: the three case-variants of 'apple' are ONE mode class
    // (frequency 3 beats 'pear' at 1); the representative is a member
    val m = spark.sql("SELECT mode(s) FROM __coll_repr").head().getString(0)
    assert(m.toLowerCase == "apple", s"mode must surface the ci-majority class, got $m")
    // min_by / max_by with a collated ORDERING value: 'apple*' ties
    // as the minimum class — the surfaced n must belong to it
    val minN = spark.sql("SELECT min_by(n, s) FROM __coll_repr").head().getLong(0)
    assert(Set(1L, 2L, 3L).contains(minN),
      s"min_by must pick from the tied minimum class, got $minN")
    val maxN = spark.sql("SELECT max_by(n, s) FROM __coll_repr").head().getLong(0)
    assert(maxN == 9L, "pear is the unique collated maximum")
    // and the min/max aggregates themselves: member-of-class
    val mn = spark.sql("SELECT min(s) FROM __coll_repr").head().getString(0)
    assert(mn.toLowerCase == "apple", s"min must be in the ci-minimum class, got $mn")
  }

  test("TailFrameRewrite refuses collated min/max (cross-reference: FramesSpec pins the repro)") {
    // the one injected rule with an equality ⇒ interchangeability
    // assumption; its collated guard is pinned in depth in FramesSpec —
    // this is the sweep's cross-reference that the audit covered it
    val df = Seq((1L, "apple"), (2L, "APPLE"), (3L, "zebra")).toDF("o", "v")
    df.createOrReplaceTempView("__coll_sweep")
    val plan = spark.sql(s"""SELECT min(${lcase("v")}) OVER (ORDER BY o
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM __coll_sweep""")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("unboundedfollowing"),
      "collated min hazard frame must keep its original frame")
  }
}
