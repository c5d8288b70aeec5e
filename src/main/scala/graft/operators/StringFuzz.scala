package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import scala.util.Random

/** Differential fuzz over the STRING-function surface — the third
  * population beside [[RelFuzz]] (relational) and [[TemporalFuzz]]
  * (temporal): seeded random compositions of the Spark∩DuckDB string
  * overlap (upper/lower/trim/reverse/substring/replace/repeat/
  * concat_ws/length/md5, LIKE predicates) over the part and customer
  * name columns. String semantics are where engines quietly disagree
  * (empty-string edges, out-of-range substrings, replace-with-empty);
  * every generated expression nests 1–3 ops so those edges actually
  * get hit. Functions whose NAMES or argument orders differ (instr vs
  * strpos, lpad defaults, negative substring starts) stay out — the
  * grammar is the agreed overlap, same discipline as the other two
  * populations.
  *
  * Same three renderings and fingerprint reduction as RelFuzz: the
  * DataFrame rendering builds real `functions._` Column trees (not
  * `expr(sql)` — the property suite would otherwise prove nothing),
  * the common SQL parses in both engines, DuckDB checksums gate it.
  */
object StringFuzz {

  val NQueries = 60
  val GateSeed = 20260814L

  // (table, key column, string columns)
  private val tables = Seq(
    ("part", "p_partkey", Seq("p_name", "p_brand", "p_type")),
    ("customer", "c_custkey", Seq("c_name", "c_mktsegment")))

  sealed trait SExpr { def sql: String; def df: Column }
  private final case class Leaf(c: String) extends SExpr {
    def sql = c; def df = col(c)
  }
  private final case class Upper(e: SExpr) extends SExpr {
    def sql = s"upper(${e.sql})"; def df = upper(e.df)
  }
  private final case class Lower(e: SExpr) extends SExpr {
    def sql = s"lower(${e.sql})"; def df = lower(e.df)
  }
  private final case class TrimE(e: SExpr) extends SExpr {
    def sql = s"trim(${e.sql})"; def df = trim(e.df)
  }
  private final case class Rev(e: SExpr) extends SExpr {
    def sql = s"reverse(${e.sql})"; def df = reverse(e.df)
  }
  private final case class SubStr(e: SExpr, i: Int, n: Int) extends SExpr {
    def sql = s"substring(${e.sql}, $i, $n)"; def df = substring(e.df, i, n)
  }
  private final case class ReplaceE(e: SExpr, from: String, to: String) extends SExpr {
    def sql = s"replace(${e.sql}, '$from', '$to')"
    def df = replace(e.df, lit(from), lit(to))
  }
  private final case class RepeatE(e: SExpr, n: Int) extends SExpr {
    def sql = s"repeat(${e.sql}, $n)"; def df = repeat(e.df, n)
  }
  private final case class ConcatWsE(sep: String, a: SExpr, b: SExpr) extends SExpr {
    def sql = s"concat_ws('$sep', ${a.sql}, ${b.sql})"
    def df = concat_ws(sep, a.df, b.df)
  }
  // terminal wrappers changing the output type
  private final case class LenOf(e: SExpr) extends SExpr {
    def sql = s"CAST(length(${e.sql}) AS BIGINT)"
    def df = length(e.df).cast(LongType)
  }
  private final case class Md5Of(e: SExpr) extends SExpr {
    def sql = s"md5(${e.sql})"; def df = md5(e.df)
  }

  final case class SQuery(id: Int, table: String, key: String,
      exprs: Seq[(String, SExpr)], predSql: Option[String],
      predDf: Option[Column], distinct: Boolean) {

    def outCols: Seq[String] = Seq(key) ++ exprs.map(_._1)

    def commonSql: String = {
      val sel = (Seq(key) ++ exprs.map { case (a, e) => s"${e.sql} AS $a" })
        .mkString(", ")
      s"SELECT ${if (distinct) "DISTINCT " else ""}$sel FROM $table" +
        predSql.map(p => s" WHERE $p").getOrElse("")
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      val base = FuzzExec.table(spark, dir, table)
      val filtered = predDf.map(base.filter).getOrElse(base)
      val proj = filtered.select(
        (Seq(col(key)) ++ exprs.map { case (a, e) => e.df.as(a) }).toIndexedSeq: _*)
      if (distinct) proj.distinct() else proj
    }
  }

  /** The seeded population: a pure function of `seed`. */
  def queries(seed: Long = GateSeed, n: Int = NQueries): Seq[SQuery] = {
    val rnd = new Random(seed)
    (0 until n).map(i => genOne(i, rnd))
  }

  private def genOne(id: Int, rnd: Random): SQuery = {
    val (table, key, strCols) = tables(rnd.nextInt(tables.size))
    def leaf(): SExpr = Leaf(strCols(rnd.nextInt(strCols.size)))
    def wrap(e: SExpr): SExpr = rnd.nextInt(8) match {
      case 0 => Upper(e)
      case 1 => Lower(e)
      case 2 => TrimE(e)
      case 3 => Rev(e)
      case 4 => SubStr(e, 1 + rnd.nextInt(5), 1 + rnd.nextInt(6))
      case 5 =>
        val pairs = Seq(("a", "x"), (" ", "_"), ("e", ""), ("r", "rr"))
        val (f, t) = pairs(rnd.nextInt(pairs.size))
        ReplaceE(e, f, t)
      case 6 => RepeatE(e, 1 + rnd.nextInt(2))
      case _ => e // identity keeps average depth modest
    }
    def tree(): SExpr = {
      val depth = 1 + rnd.nextInt(3)
      var e = leaf()
      for (_ <- 1 to depth) e = wrap(e)
      if (rnd.nextInt(100) < 20) ConcatWsE("-", e, leaf()) else e
    }
    val nExprs = 1 + rnd.nextInt(2)
    val exprs = (0 until nExprs).map { j =>
      val t = tree()
      val terminal = rnd.nextInt(10) match {
        case 0 => LenOf(t)
        case 1 => Md5Of(t)
        case _ => t
      }
      s"expr_$j" -> terminal
    }
    val pred = rnd.nextInt(10) match {
      case x if x < 4 => (None, None)
      case x if x < 7 =>
        val c = strCols(rnd.nextInt(strCols.size))
        val ch = ('a' + rnd.nextInt(26)).toChar
        (Some(s"$c LIKE '%$ch%'"), Some(col(c).like(s"%$ch%")))
      case _ =>
        val c = strCols(rnd.nextInt(strCols.size))
        val k = 3 + rnd.nextInt(12)
        if (rnd.nextBoolean())
          (Some(s"length($c) > $k"), Some(length(col(c)) > k))
        else (Some(s"length($c) <= $k"), Some(length(col(c)) <= k))
    }
    SQuery(id, table, key, exprs, pred._1, pred._2,
      distinct = rnd.nextInt(100) < 50)
  }

  // ---- fingerprint reduction (the RelFuzz discipline) ----

  private def canonDf(q: SQuery): Column =
    concat_ws("|", q.outCols.map(c =>
      coalesce(col(c).cast(StringType), lit(RelFuzz.NullSentinel))): _*)

  def fingerprint(q: SQuery, frame: DataFrame): DataFrame =
    frame.select(canonDf(q).as("__c"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        coalesce(sum(Sketches.md5Long56(col("__c")) % RelFuzz.ModP), lit(0L))
          .as("checksum"))
      .select(lit(q.id.toLong).as("qid"), col("n_rows"), col("checksum"))

  def fingerprintAll(spark: SparkSession, dir: String,
      frames: SQuery => DataFrame): DataFrame = {
    import scala.collection.parallel.CollectionConverters._
    val pool = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(FuzzExec.poolSize(spark)))
    val par = queries().par
    par.tasksupport = pool
    val rows =
      try par.map { q =>
        val r = fingerprint(q, frames(q)).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
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
         |FROM (SELECT $canon AS __c FROM (${q.commonSql}) __q) __cq""".stripMargin
    }
    s"SELECT qid, n_rows, checksum FROM (\n${branches.mkString("\nUNION ALL\n")}\n) ORDER BY qid"
  }
}

/** q_fz3 — the string-function differential gate. */
object StringFuzzQueries extends QueryModule {
  private val fz3 = Q(
    "q_fz3_string_fuzz",
    s"string differential fuzz: ${StringFuzz.NQueries} seeded nested string-op " +
      "compositions, fingerprint-compared Spark vs DuckDB",
    (s, d) => StringFuzz.fingerprintAll(s, d, q => q.df(s, d)),
    Some(StringFuzz.duckOracleSql))

  override val all: Seq[Q] = Seq(fz3)
}
