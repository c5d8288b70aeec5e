package graft.genomics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Small domain annotators, all pure column expressions (codegen'd):
  *
  *  - D6 strain parsing (`gisaid/EthzParser.java:9-31`)
  *  - D7 frameshift detection (`database/R/utility.R:264-300`)
  *  - D9 sample-condition classification
  *    (`database/python/extract_sample_conditions.py:37-103`)
  *  - D10 imprecise-date normalization
  *    (`database/R/automation/auto_import_gisaid.R:106-118`)
  *  - D13 COVID keyword filter (`pubmed/PubmedImporter.java:69-79`)
  *  - D14 article version pick (`rxiv/RxivDownloader.java:103-125`)
  *  - D15 alias diff (`pangolineage/PangolinLineageAliasImporter.java:45-196`)
  *  - D16 AA-mutation decomposition (`spectrum/sequences_gisaid_api_based.sql:116-122`)
  */
object Annotations {

  // D6: ETHZ strain ownership + ethid extraction.
  def isOurs(strain: Column): Column = strain.contains("-ETHZ-")

  def parseEthid(strain: Column): Column = {
    val m = regexp_extract(strain, ".*ETHZ-([0-9]+)/.*", 1)
    when(m === "", lit(null).cast("int")).otherwise(m.cast("int"))
  }

  // D7: frameshift iff any gap "start-end" has (end-start) % 3 != 0;
  // null/empty gaps → null (unknown), exactly like the R original.
  def hasFrameshift(gaps: Column): Column =
    when(gaps.isNull || gaps === "", lit(null).cast("boolean"))
      .otherwise(exists(split(gaps, ","), g =>
        (split(g, "-").getItem(1).cast("long") - split(g, "-").getItem(0).cast("long")) % 3 =!= 0))

  // D9: sample-condition classifier — ordered regex classes with
  // no-match / multi-match sentinels.
  val conditionClasses: Seq[(String, String, String)] = Seq(
    // (extended condition, regex, condition group)
    ("h2o_negative_control", "^H2O", "negative_control"),
    ("empty_well_negative_control", "^((EMPTY)|(empty))", "negative_control"),
    ("negative_pcr_test", "^neg_", "negative_control"),
    ("negative_control_fgcz", "^NTC_NA_NTC_NA", "negative_control"),
    ("twist_positive_control", "^(pos_)|(Twist_control)", "positive_control"),
    ("positive_controls", "CoV_ctrl_", "positive_control"),
    ("ethz_id_sample", "^[0-9]{6}(_Plate)?_(p)?[0-9]+", "experimental_condition"),
    ("wastewater_sample", "^[0-9]{2}_202[0-9]_", "experimental_condition"),
    ("fgcz_sample", "^[0-9]{8}_Plate_[0-9]+", "experimental_condition"),
    ("basel_uzh_sequencing", "^[A-Z][0-9]_[0-9]+", "experimental_condition"),
    ("lab_dr_risch", "^674597001", "experimental_condition"),
    ("usz_tier_sample", "^USZ_[0-9]_Tier", "experimental_condition"))

  /** struct(condition, extended_condition) per sample name. */
  def sampleCondition(sample: Column): Column = {
    val nMatches = conditionClasses
      .map { case (_, re, _) => when(sample.rlike(re), 1).otherwise(0) }
      .reduce(_ + _)
    val ec = conditionClasses.foldRight(lit("unassigned")) { case ((name, re, _), acc) =>
      when(sample.rlike(re), lit(name)).otherwise(acc)
    }
    val ecFinal = when(nMatches === 0, "unassigned")
      .when(nMatches > 1, "no_unique_assignment")
      .otherwise(ec)
    val groupMap = conditionClasses.map(c => c._1 -> c._3).toMap
    val group = groupMap.foldLeft(
        when(ecFinal === "unassigned", "unassigned")
          .when(ecFinal === "no_unique_assignment", "no_unique_assignment")) {
      case (acc, (ecName, grp)) => acc.when(ecFinal === ecName, grp)
    }
    struct(group.as("condition"), ecFinal.as("extended_condition"))
  }

  // D10: GISAID imprecise dates — 'yyyy' → Jan 1, 'yyyy-mm' → 1st,
  // 'yyyy-mm-XX' → 1st; anything unparseable → null.
  def normalizeImpreciseDate(dateStr: Column): Column = {
    val completed =
      when(substring(dateStr, 9, 2) === "XX", concat(substring(dateStr, 1, 7), lit("-01")))
        .when(length(dateStr) === 7, concat(dateStr, lit("-01")))
        .when(length(dateStr) === 4, concat(dateStr, lit("-01-01")))
        .otherwise(dateStr)
    try_to_timestamp(completed, lit("yyyy-MM-dd")).cast("date")
  }

  /** D10 companion: non-numeric age → null int
    * (auto_import_gisaid.R:117-118 yields NA). The feed carries '?',
    * 'unknown', range strings like '30-39' — a digits-only guard keeps
    * the ANSI cast (which throws on malformed input) unreachable for
    * all of them. */
  def normalizeAge(age: Column): Column =
    when(age.rlike("^[0-9]+$"), age.cast("int")).otherwise(lit(null).cast("int"))

  /** Date range sanity guard (utility.R:933-955): null out dates
    * outside [2020-02-24, today]. */
  def dateRangeGuard(d: Column, minDate: String = "2020-02-24", maxDate: Column = current_date()): Column =
    when(d < to_date(lit(minDate)) || d > maxDate, lit(null).cast("date")).otherwise(d)

  // D13: keyword filter over concatenated text columns (reference uses
  // the fixed COVID regex; the pattern is a parameter here).
  def keywordMatch(pattern: String, cols: Column*): Column =
    lower(concat_ws(" ", cols: _*)).rlike(pattern)

  def covidRelated(cols: Column*): Column =
    keywordMatch("covid-19|covid19|sars-cov-2", cols: _*)

  // D14: keep max version per doi (delete+reinsert on newer).
  // `tieBreak` columns order peers that share the max version —
  // without one, row_number picks an arbitrary peer and the winner can
  // change across retries/partitionings (callers needing replay
  // idempotence pass a content hash).
  def keepMaxVersion(df: DataFrame, keyCol: String, versionCol: String,
      tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // D15: pangolin alias diff/sync vs remote: add/update/delete/keep,
  // with alias validity regex.
  val aliasValidityRe = "^[A-Z]{1,2}(\\.[0-9]{1,3})*$"

  def aliasDiff(existing: DataFrame, remote: DataFrame): DataFrame = {
    val e = existing.select(col("alias").as("e_alias"), col("full_name").as("e_full"))
    val r = remote.filter(col("alias").rlike(aliasValidityRe))
      .select(col("alias").as("r_alias"), col("full_name").as("r_full"))
    e.join(r, col("e_alias") === col("r_alias"), "full")
      .select(
        coalesce(col("e_alias"), col("r_alias")).as("alias"),
        coalesce(col("r_full"), col("e_full")).as("full_name"),
        when(col("e_alias").isNull, "add")
          .when(col("r_alias").isNull, "delete")
          .when(!(col("e_full") <=> col("r_full")), "update")
          .otherwise("keep").as("action"))
  }

  // D8: pairwise hamming distance with IUPAC ambiguity — two bases
  // match if their IUPAC sets intersect (utility.R:306-313 delegates
  // to ape/phangorn; the ambiguity semantics are standard IUPAC).
  private val iupac: Map[Char, Set[Char]] = Map(
    'A' -> Set('A'), 'C' -> Set('C'), 'G' -> Set('G'), 'T' -> Set('T'),
    'R' -> Set('A', 'G'), 'Y' -> Set('C', 'T'), 'S' -> Set('G', 'C'),
    'W' -> Set('A', 'T'), 'K' -> Set('G', 'T'), 'M' -> Set('A', 'C'),
    'B' -> Set('C', 'G', 'T'), 'D' -> Set('A', 'G', 'T'),
    'H' -> Set('A', 'C', 'T'), 'V' -> Set('A', 'C', 'G'),
    'N' -> Set('A', 'C', 'G', 'T'))

  /** Positions where the IUPAC sets are disjoint (gaps '-' and unknown
    * chars are skipped, matching distance-over-known-sites semantics). */
  def iupacHamming(a: String, b: String): Int = {
    require(a.length == b.length, "sequences must be aligned")
    var d = 0; var i = 0
    while (i < a.length) {
      val ca = Character.toUpperCase(a.charAt(i))
      val cb = Character.toUpperCase(b.charAt(i))
      (iupac.get(ca), iupac.get(cb)) match {
        case (Some(sa), Some(sb)) if sa.intersect(sb).isEmpty => d += 1
        case _ => // compatible or unknown/gap → not a difference
      }
      i += 1
    }
    d
  }

  /** Mean pairwise IUPAC-hamming distance over a small sequence set
    * (the reference uses this interactively on bounded sets). */
  def meanPairwiseDistance(seqs: Seq[String]): Double = {
    val pairs = for { i <- seqs.indices; j <- (i + 1) until seqs.length }
      yield iupacHamming(seqs(i), seqs(j))
    if (pairs.isEmpty) 0.0 else pairs.sum.toDouble / pairs.length
  }

  // D16: 'S:N501Y' → (gene, position, base-change columns). A string
  // that doesn't match the mutation shape yields a null position (the
  // empty extract must not reach the ANSI int cast).
  def decomposeAaMutation(aa: Column): Column = {
    val pos = regexp_extract(aa, ":([A-Z*])([0-9]+)([A-Z*])$", 2)
    struct(
      split(aa, ":").getItem(0).as("gene"),
      regexp_extract(aa, ":([A-Z*])([0-9]+)([A-Z*])$", 1).as("ref_aa"),
      when(pos === "", lit(null).cast("int")).otherwise(pos.cast("int")).as("position"),
      regexp_extract(aa, ":([A-Z*])([0-9]+)([A-Z*])$", 3).as("alt_aa"))
  }
}
