package graft.genomics

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** D5 — geographic-location rule rewriter.
  *
  * Same algorithm as the reference
  * (`database/java/.../gisaid/GeoLocationMapper.java:26-135`, itself a
  * port of Nextstrain ncov-ingest's transform): rules are
  * 4-level (region/country/division/location) paths with `*` wildcards
  * on the left (match anything at that level; full match shadows
  * wildcard per key when both subtrees exist) and `*` passthrough on
  * the right (keep the input's value at that level). Rules apply
  * repeatedly until a fixpoint, with a 1000-application cycle guard.
  */
object GeoRules {

  final case class GeoLocation(region: String, country: String, division: String, location: String) {
    def toArray: Array[String] = Array(region, country, division, location)
  }

  type L4 = Map[String, Array[String]]
  type L3 = Map[String, L4]
  type L2 = Map[String, L3]
  type L1 = Map[String, L2]

  /** Parse `raw_region/raw_country/raw_div/raw_loc<TAB>canon...` lines;
    * malformed lines (not 4+4 slash-parts) are skipped like the
    * reference (GeoLocationMapper.java:42-48). */
  def parseRules(lines: Seq[String]): L1 = {
    var root: L1 = Map.empty
    lines.foreach { line =>
      val lr = line.split("\t")
      if (lr.length == 2) {
        val left = lr(0).toLowerCase.split("/", -1)
        val right = lr(1).split("/", -1)
        if (left.length == 4 && right.length == 4) {
          val l2 = root.getOrElse(left(0), Map.empty: L2)
          val l3 = l2.getOrElse(left(1), Map.empty: L3)
          val l4 = l3.getOrElse(left(2), Map.empty: L4)
          root = root.updated(left(0),
            l2.updated(left(1), l3.updated(left(2), l4.updated(left(3), right))))
        }
      }
    }
    root
  }

  private def mergeMaps[V](full: Option[Map[String, V]], wild: Option[Map[String, V]]): Option[Map[String, V]] =
    (full, wild) match {
      case (Some(f), Some(w)) => Some(w ++ f) // full-match keys win
      case (f, w) => f.orElse(w)
    }

  private def findRule(rules: L1, g: GeoLocation): Option[Array[String]] = {
    val keys = g.toArray.map(v => Option(v).getOrElse("").trim.toLowerCase)
    val l2 = mergeMaps(rules.get(keys(0)), rules.get("*"))
    val l3 = l2.flatMap(m => mergeMaps(m.get(keys(1)), m.get("*")))
    val l4 = l3.flatMap(m => mergeMaps(m.get(keys(2)), m.get("*")))
    l4.flatMap(m => m.get(keys(3)).orElse(m.get("*")))
  }

  /** Apply rules to fixpoint (cycle guard at 1000 like the reference). */
  def resolve(rules: L1, g: GeoLocation): GeoLocation = {
    val normalized = GeoLocation(
      Option(g.region).getOrElse("").trim,
      Option(g.country).getOrElse("").trim,
      Option(g.division).getOrElse("").trim,
      Option(g.location).getOrElse("").trim)
    var cur = normalized
    var applied = 0
    var done = false
    while (!done) {
      findRule(rules, cur) match {
        case None => done = true
        case Some(rhs) =>
          if (applied > 1000)
            throw new RuntimeException(s"More than 1000 geo rules applied; cyclic rules? $cur")
          val arr = cur.toArray
          val next = GeoLocation(
            if (rhs(0) != "*") rhs(0) else arr(0),
            if (rhs(1) != "*") rhs(1) else arr(1),
            if (rhs(2) != "*") rhs(2) else arr(2),
            if (rhs(3) != "*") rhs(3) else arr(3))
          if (next == cur) done = true
          else { cur = next; applied += 1 }
      }
    }
    GeoLocation(
      if (cur.region.nonEmpty) cur.region else null,
      if (cur.country.nonEmpty) cur.country else null,
      if (cur.division.nonEmpty) cur.division else null,
      if (cur.location.nonEmpty) cur.location else null)
  }

  /** Spark application: broadcast the rule trie, resolve as a struct
    * column (region, country, division, location). */
  def resolveUdf(spark: SparkSession, rules: L1): (Column, Column, Column, Column) => Column = {
    val bc = spark.sparkContext.broadcast(rules)
    val f = udf { (r: String, c: String, d: String, l: String) =>
      val res = resolve(bc.value, GeoLocation(r, c, d, l))
      (res.region, res.country, res.division, res.location)
    }
    (r, c, d, l) => f(r, c, d, l)
      .cast("struct<region:string,country:string,division:string,location:string>")
  }
}
